package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations, written once and usable from BOTH
  * batch and Structured Streaming inputs — Spark compiles the identical
  * logical operators either way (`withWatermark` is a no-op in batch).
  *
  * Streaming path: `spark.readStream` → [[tumbling]]/[[sessions]] →
  * `writeStream` with `OutputMode.Append` (watermark bounds state and
  * drops late data). Batch path: same builders, oracle-checked via the
  * q_window_tumbling / q_window_session queries.
  *
  * Scale: state size is #open-windows × #keys; the watermark is what keeps
  * that bounded on an unbounded stream — always set it from the maximum
  * expected event lateness, never unbounded.
  */
object EventStreams {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** 1-hour tumbling windows per event_type: count + exact value sum. */
  def tumbling(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding (hopping) 1h/30min windows per event_type. */
  def sliding(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Custom arbitrary-state operator (mapGroupsWithState): per-user running
    * event counts that survive across micro-batches. Update output mode in
    * streaming; in batch the state starts empty so it degrades to a plain
    * groupBy count — tested equivalent in StreamingSpec. */
  def runningUserCounts(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          (uid, n)
      }
  }

  /** Gap-based session windows per user: a session extends while the next
    * event arrives < gap after the previous one; end = last event + gap.
    * Timestamps truncated to ms in the projection for cross-engine parity
    * (the corpus carries sub-microsecond components). */
  def sessions(events: DataFrame, gap: String = "10 minutes",
               watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        date_trunc("MILLISECOND", col("session_window.start")).as("session_start"),
        date_trunc("MILLISECOND", col("session_window.end")).as("session_end"),
        col("n_events"), col("total_value"))
}
