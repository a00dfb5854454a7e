package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Stream==batch proof for the point-in-time feature assembly: the
  * streaming PitFeatureProcessor over the REAL sf events table,
  * replayed in event-time order across three micro-batches, must emit
  * exactly the batch q_events_pit_features rows. */
class StreamingPitSpec extends SparkSpec {
  import spark.implicits._

  test("PIT features: streaming (transformWithState) == batch RANGE window") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val real = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .collect()
      .sortBy(r => (r.getTimestamp(1).getTime, r.getLong(0)))
      .map(r => EvFull(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .toSeq
    val mem = MemoryStream[EvFull]
    val q = EventStreams.pitFeatures(mem.toDF())
      .toDF("user_id", "event_id", "tm", "f_clicks", "f_views", "f_errors",
        "f_value_micro")
      .writeStream.format("memory").queryName("pit_out")
      .outputMode("append").start()
    val third = real.length / 3
    mem.addData(real.take(third)); q.processAllAvailable()
    mem.addData(real.slice(third, 2 * third)); q.processAllAvailable()
    mem.addData(real.drop(2 * third)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("pit_out")
      .orderBy("user_id", "tm", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val batch = SparkEntry.queries("q_events_pit_features")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("tm"), r.getAs[Long]("f_clicks"), r.getAs[Long]("f_views"),
        r.getAs[Long]("f_errors"), r.getAs[Long]("f_value_micro"))).toSeq
    assert(streamed.nonEmpty, "fixture must contain purchases")
    assert(streamed == batch)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }
}
