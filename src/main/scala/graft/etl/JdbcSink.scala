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

  /** @return number of rows appended (0 = skipped or failed). */
  def append(df: DataFrame, url: String, table: String,
             props: Properties = new Properties(),
             maxConnections: Int = 8): Long = {
    if (df.isEmpty) {
      log.warn(s"JdbcSink: empty DataFrame — skipping append to $table")
      0L
    } else try {
      val out = df.coalesce(maxConnections)
      out.write.mode("append").jdbc(url, table, props)
      df.count()
    } catch {
      case e: Exception =>
        log.error(s"JdbcSink: append to $table failed: ${e.getMessage}")
        0L
    }
  }
}
