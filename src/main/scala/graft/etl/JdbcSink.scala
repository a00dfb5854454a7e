package graft.etl

import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.slf4j.LoggerFactory

/** JDBC append sink — reference operator A18
  * (`/root/reference/etl_elb_log_to_mysql.py:152-160`): append to a table,
  * auto-created on first write; empty input → warn and skip; failures are
  * logged and swallowed (the reference's permissive semantics).
  *
  * Spark-native mechanics: `DataFrameWriter.jdbc` writes executor-side with
  * one connection per partition — at scale, `coalesce` the frame to a
  * partition count the database can absorb (connections = partitions), and
  * size `batchsize` (default 1000) to trade round-trips vs transaction
  * bulk. For MySQL specifically pass
  * `rewriteBatchedStatements=true` in the URL for true bulk inserts.
  */
object JdbcSink {
  private val log = LoggerFactory.getLogger(getClass)

  /** Appends `df` and returns the number of rows written.
    *
    * The upstream pipeline is evaluated EXACTLY ONCE: the coalesced frame
    * is persist()-marked, so the empty-guard probe (required because the
    * reference skips the write entirely — no table auto-creation — on
    * empty input) materializes only partition 0 into the cache, and the
    * write job reuses that block and computes the remaining partitions,
    * each exactly once. A heavy upstream (joins, dedup, aggregation) no
    * longer runs twice, and probe and write cannot disagree if the source
    * changes between jobs — both read the same cached partitions. The
    * row count rides the write itself as an `observe()` metric above the
    * cache (never a separate `count()` job).
    *
    * Not transactional across partitions: each partition commits its own
    * JDBC batch, so a mid-write task failure can leave earlier partitions'
    * rows committed while this method logs the error and returns 0 —
    * matching the reference's permissive append (no rollback there
    * either). Use an idempotent staging table + swap if exactly-once
    * matters downstream.
    *
    * @return number of rows appended (0 = skipped or failed). */
  def append(df: DataFrame, url: String, table: String,
             props: Properties = new Properties(),
             maxConnections: Int = 8): Long = {
    val mat = df.coalesce(maxConnections)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (mat.isEmpty) {
        log.warn(s"JdbcSink: empty DataFrame — skipping append to $table")
        0L
      } else {
        val obs = org.apache.spark.sql.Observation()
        mat.observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows_written"))
          .write.mode("append").jdbc(url, table, props)
        obs.get("rows_written").asInstanceOf[Long]
      }
    } catch {
      case e: Exception =>
        log.error(s"JdbcSink: append to $table failed: ${e.getMessage}")
        0L
    } finally mat.unpersist(blocking = false)
  }
}
