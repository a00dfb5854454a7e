package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.slf4j.LoggerFactory

/** The reference's end-to-end orchestration (A19, `run_etl` at
  * `/root/reference/etl_elb_log_to_mysql.py:162-177`): list+read gz logs →
  * parse to the 13-column relation → preview → optional row cap → JDBC
  * append — as ONE lazy Spark plan per action instead of four eager
  * materializations.
  *
  * Differences from the reference, by design:
  *   - listing/reading is distributed and unbounded (no 1000-object cap);
  *   - nothing is resident in driver memory (the reference accumulates
  *     every parsed row in one Python list, `:135,148`);
  *   - skip counts come from `observe()` metrics, not log lines;
  *   - the demo `head(1)` cap (`:175-176`) is an optional `limit` arg.
  */
object EtlPipeline {
  private val log = LoggerFactory.getLogger(getClass)

  final case class Result(rowsIn: Long, rowsParsed: Long, rowsLoaded: Long)

  def run(spark: SparkSession, inputPath: String, jdbcUrl: String,
          table: String = "elb_log_data", props: Properties = new Properties(),
          previewRows: Int = 5, loadLimit: Option[Int] = None): Result = {
    val lines = AlbLogParser.readLogs(spark, inputPath)
    val (parsed, inObs, outObs) = AlbLogParser.parseObserved(lines)

    // Full count FIRST: an Observation binds to its first completed action,
    // and a limit-preview would short-circuit the scan → partial metrics.
    parsed.count()
    val rowsIn = inObs.get("rows_in").asInstanceOf[Long]
    val rowsParsed = outObs.get("rows_out").asInstanceOf[Long]
    log.info(s"EtlPipeline: $rowsIn lines in, $rowsParsed parsed " +
      s"(${rowsIn - rowsParsed} dropped)")
    log.info(s"EtlPipeline preview:\n${parsed.limit(previewRows).collect().mkString("\n")}")

    val toLoad: DataFrame = loadLimit.fold(parsed)(parsed.limit)
    val loaded = JdbcSink.append(toLoad, jdbcUrl, table, props)
    Result(rowsIn, rowsParsed, loaded)
  }
}
