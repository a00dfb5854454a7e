package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression pin for the events loader across every physical `ts` encoding
  * the driver corpus has shipped. Round 8's corpus regeneration switched
  * `events.ts` from INT64 nanos to parquet `timestamp[us]` (TIMESTAMP_NTZ to
  * Spark) and the then-hardcoded nanos path killed all 17 event-time queries
  * at analysis time — this suite makes the next encoding shift fail here, in
  * CI, instead of silently in the driver bench. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir(suffix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"tables-$suffix").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // one known instant: 2024-03-01T12:34:56.789012 UTC
  private val micros = 1709296496789012L

  private def loadedMicros(dir: String): Long = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros($"ts")).as[Long].head()
  }

  test("events loader: INT64 nanos encoding (original corpus)") {
    val dir = fixtureDir("nanos")
    Seq((micros * 1000L, 7L)).toDF("ts", "user_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == micros)
  }

  test("events loader: timestamp[us] NTZ encoding (round-8 regenerated corpus)") {
    val dir = fixtureDir("ntz")
    // Spark writes TIMESTAMP_NTZ as parquet timestamp[us] isAdjustedToUTC=false
    // — byte-identical to what the driver's pyarrow writer now emits.
    val df = Seq((micros, 7L)).toDF("us", "user_id")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"), $"user_id")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == micros)
  }

  test("events loader: timestamp[us] UTC-adjusted encoding (TimestampType pass-through)") {
    val dir = fixtureDir("tz")
    Seq((micros, 7L)).toDF("us", "user_id")
      .select(timestamp_micros($"us").as("ts"), $"user_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == micros)
  }

  test("events loader: live corpus resolves and carries real rows") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }
}
