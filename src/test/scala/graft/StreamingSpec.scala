package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

case class Ev(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
case class EvR(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
case class EvFull(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
  event_type: String, value: Double)

/** Structured Streaming runs the SAME operator builders as the batch
  * oracle queries — this spec proves stream-mode results converge to the
  * batch results on the same data. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  def evs: Seq[Ev] = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0 until 100).map { i =>
      Ev(new java.sql.Timestamp(base.getTime + i * 7 * 60 * 1000L + i),
        i % 3, if (i % 2 == 0) "click" else "view", (i % 10) + 0.25)
    }
  }

  test("tumbling window: streaming (append, watermarked) == batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumbling(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    mem.addData(evs)
    q.processAllAvailable()
    // advance watermark far enough to close all windows, then flush
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumbling_out")
      .filter(col("event_type").isin("click", "view"))
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventStreams.tumbling(evs.toDF())
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("OHLC windowed resample: streaming (append, watermarked) == batch") {
    implicit val sqlCtx = spark.sqlContext
    // Fixture with explicit event_id: the in-bucket order is
    // (ms-truncated ts, event_id) — q_events_ohlc's composite. The tie
    // pair shares one timestamp with user_id order OPPOSITE to event_id
    // order, so an ordering key of (ts, user_id) would flip open/close.
    val tieTs = java.sql.Timestamp.valueOf("2024-01-05 08:00:00")
    // second collision class: two events from the SAME user at the SAME
    // ms timestamp — under a (ts, user_id) ord the key is DUPLICATED and
    // min_by/max_by become nondeterministic; only event_id breaks the
    // tie deterministically. They straddle a micro-batch boundary below.
    val tieTs2 = java.sql.Timestamp.valueOf("2024-01-05 09:00:00")
    val data: Seq[EvFull] = evs.zipWithIndex.map { case (e, i) =>
      EvFull(i.toLong, e.ts, e.user_id, e.event_type, e.value)
    } ++ Seq(
      EvFull(1000L, tieTs, 9L, "click", 111.5),  // first by event_id, LAST by user_id
      EvFull(1001L, tieTs, 2L, "click", 222.5),
      EvFull(1002L, tieTs2, 5L, "view", 10.25),  // same (user, ms-ts) pair:
      EvFull(1003L, tieTs2, 5L, "view", 20.75))  // only event_id orders them
    val mem = MemoryStream[EvFull]
    val q = EventStreams.ohlc(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    // split across micro-batches so open/close partials must MERGE;
    // both tie pairs arrive LAST (their timestamps are the max, so
    // earlier batches aren't dropped as late) and out of order — the
    // higher event_id first — so the cross-batch min_by merge must
    // still resolve open to the lower event_id, for the different-user
    // collision AND the same-(user, ms-ts) one
    mem.addData(data.take(37)); q.processAllAvailable()
    mem.addData(data.slice(37, 100) ++ Seq(data(101), data(103))); q.processAllAvailable()
    mem.addData(data(100), data(102)); q.processAllAvailable()
    mem.addData(EvFull(9999L,
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ohlc_out")
      .filter(col("event_type").isin("click", "view"))
      .orderBy("window_start", "event_type").collect().toSeq
    // independent batch expectation: the q_events_ohlc ranking, not
    // EventStreams.ohlc itself (self-compare can't catch an ordering
    // key that diverges from the batch twin)
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type", "h")
      .orderBy(date_trunc("millisecond", col("ts")), col("event_id"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type", "h")
      .orderBy(date_trunc("millisecond", col("ts")).desc, col("event_id").desc)
    val batch = data.toDF()
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"),
        floor(col("value") * 1000000).cast("long").as("v"))
      .withColumn("rn_f", row_number().over(wf))
      .withColumn("rn_l", row_number().over(wl))
      .groupBy("event_type", "h")
      .agg(max(when(col("rn_f") === 1, col("v"))).as("open"),
        max("v").as("high"), min("v").as("low"),
        max(when(col("rn_l") === 1, col("v"))).as("close"),
        count(lit(1)).as("volume"))
      .select(col("h").as("window_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
    // the tie window resolved by event_id: open=111.5, close=222.5
    val tieRow = streamed.find(_.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-05 08:00:00")).get
    assert(tieRow.getLong(2) == 111500000L && tieRow.getLong(5) == 222500000L)
    // the same-(user, ms-ts) window: a (ts, user_id) ord would leave
    // open/close to whichever partial merged first — only the event_id
    // component makes open=10.25, close=20.75 deterministic
    val tieRow2 = streamed.find(_.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-05 09:00:00")).get
    assert(tieRow2.getLong(2) == 10250000L && tieRow2.getLong(5) == 20750000L,
      s"same-user ms-collision must resolve by event_id: $tieRow2")
    // high/low bracket open/close in every window
    streamed.foreach { r =>
      val (o, h, l, c) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("windowed HLL user sketch: streaming (append) == batch == exact") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.windowedUserSketch(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("sketch_out")
      .outputMode("append").start()
    // two micro-batches so per-window sketches must MERGE across batches
    val (a, b) = evs.splitAt(50)
    mem.addData(a); q.processAllAvailable()
    mem.addData(b); q.processAllAvailable()
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sketch_out")
      .filter(col("window_start") < java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      .orderBy("window_start").collect().toSeq
    val batch = EventStreams.windowedUserSketch(evs.toDF())
      .orderBy("window_start").collect().toSeq
    assert(streamed == batch)
    // sparse-mode sketches are exact on this 3-user domain
    val exact = evs.toDF()
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .orderBy("ws").collect().toSeq
    assert(streamed.map(r => (r.getTimestamp(0), r.getLong(1))) ==
      exact.map(r => (r.getTimestamp(0), r.getLong(1))))
  }

  test("Count-Min cells: streaming (append, watermarked) == batch; estimates bound exact counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.countMinCells(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("cm_out")
      .outputMode("append").start()
    // split so per-cell partial counts must MERGE across micro-batches
    val (a, b) = evs.splitAt(41)
    mem.addData(a); q.processAllAvailable()
    mem.addData(b); q.processAllAvailable()
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val cut = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val streamed = spark.table("cm_out")
      .filter(col("window_start") < cut)
      .orderBy("window_start", "r", "b").collect().toSeq
    val batch = EventStreams.countMinCells(evs.toDF())
      .orderBy("window_start", "r", "b").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // sketch contract per window: min over the 4 row cells for a key's
    // buckets >= the key's exact count (never underestimates)
    val cells = streamed.map(r =>
      ((r.getTimestamp(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    def bucket(r: Long, key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$key".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 256
    }
    val exact = evs.groupBy(e =>
      (e.ts.getTime - e.ts.getTime % 3600000L, e.event_type))
      .view.mapValues(_.size.toLong)
    exact.foreach { case ((hourMs, tpe), n) =>
      val ws = new java.sql.Timestamp(hourMs)
      val est = (0L to 3L).map(r => cells(( ws, r, bucket(r, tpe) ))).min
      assert(est >= n, s"$tpe @$ws: est $est < exact $n")
    }
  }

  test("watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumbling(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:30:00")
    mem.addData(Ev(t0, 1L, "click", 1.0))
    q.processAllAvailable()
    // advance event time (and hence the watermark) past 00:00-01:00
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    // this event is hours behind the watermark → must be dropped
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-01-01 00:40:00"), 1L, "late", 9.0))
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("late_out").collect()
    assert(!emitted.exists(_.getAs[String]("event_type") == "late"),
      s"late row leaked: ${emitted.mkString(";")}")
    val w0 = emitted.filter(r =>
      r.getAs[java.sql.Timestamp]("window_start") ==
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(w0.length == 1 && w0.head.getAs[Long]("n_events") == 1L)
  }

  test("mapGroupsWithState: running per-user counts accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.runningUserCounts(mem.toDF())
      .toDF("user_id", "n_events")
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    mem.addData(evs.take(50))
    q.processAllAvailable()
    mem.addData(evs.drop(50))
    q.processAllAvailable()
    q.stop()

    val finalCounts = spark.table("state_out")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = evs.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(finalCounts == expected)
  }

  test("transformWithState (Spark 4 API): running totals accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = EventStreams.runningUserTotals(mem.toDF())
        .toDF("user_id", "n_events", "total_cents")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      mem.addData(evs.take(50))
      q.processAllAvailable()
      mem.addData(evs.drop(50))   // state must carry across micro-batches
      q.processAllAvailable()
      q.stop()

      // last update per user == full-data batch aggregate
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_events").desc)
      val streamed = spark.table("tws_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "n_events", "total_cents")
        .orderBy("user_id").collect().toSeq
      val batch = evs.toDF()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("total_cents"))
        .orderBy("user_id").collect().toSeq
      assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
        batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }


  test("streaming CEP (transformWithState) == batch q_events_cep under time-ordered replay") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the REAL sf0.001 events table, replayed in event-time order
      // across three micro-batches (the ordering contract the processor
      // documents); final per-user funnel counts must equal the batch
      // q_events_cep fold on the same table
      val real = Tables.events(spark, sf)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("ts"), col("user_id"), col("event_type"), col("value"),
          col("event_id"))
        .collect()
        .sortBy(r => (r.getTimestamp(0).getTime, r.getLong(4)))
        .map(r => EvFull(r.getLong(4), r.getTimestamp(0), r.getLong(1),
          r.getString(2), r.getDouble(3)))
        .toSeq
      val mem = MemoryStream[EvFull]
      val q = EventStreams.streamingCepFunnels(mem.toDF())
        .toDF("user_id", "n_funnels", "n_events")
        .writeStream.format("memory").queryName("cep_out")
        .outputMode("update").start()
      val third = real.length / 3
      mem.addData(real.take(third)); q.processAllAvailable()
      mem.addData(real.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(real.drop(2 * third)); q.processAllAvailable()
      q.stop()

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_events").desc)
      val streamed = spark.table("cep_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "n_funnels")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = SparkEntry.queries("q_events_cep")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_funnels")).toMap
      assert(streamed == batch)
      assert(batch.values.sum > 0, "fixture must complete at least one funnel")
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }


  test("dropDuplicatesWithinWatermark: re-delivered events collapse to exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val base = evs.zipWithIndex.map { case (e, i) =>
      EvFull(i.toLong, e.ts, e.user_id, e.event_type, e.value)
    }
    val mem = MemoryStream[EvFull]
    val q = EventStreams.dedupWithinWatermark(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // batch 1 delivers 0..59; batch 2 RE-delivers 40..59 (the
    // at-least-once overlap) plus the fresh tail — the re-deliveries
    // arrive within the watermark horizon and must be dropped
    mem.addData(base.take(60)); q.processAllAvailable()
    mem.addData(base.slice(40, 100)); q.processAllAvailable()
    mem.addData(EvFull(9999L,
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out").filter(col("event_type") =!= "late")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == base.map(_.event_id).sorted.toSeq,
      s"expected each event exactly once, got ${got.length} of ${base.length}")
  }

  test("chained stateful aggs: windowed top-type, streaming (append) == batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.topTypePerHour(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("toptype_out")
      .outputMode("append").start()
    mem.addData(evs)
    q.processAllAvailable()
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("toptype_out")
      .filter(col("top_type") =!= "late")
      .orderBy("window_start").collect().toSeq
    val batch = EventStreams.topTypePerHour(evs.toDF())
      .orderBy("window_start").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming as-of enrichment (transformWithState) == native batch as-of join") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // clicks (even i) and errors (odd i) interleaved, strictly
      // increasing ts per user; user 3 has errors but never clicks
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val data = (0 until 60).map { i =>
        Ev(new java.sql.Timestamp(base.getTime + i * 60000L), i % 3,
          if (i % 2 == 0) "click" else "error", (i % 10) + 0.25)
      } :+ Ev(new java.sql.Timestamp(base.getTime + 99 * 60000L), 3L, "error", 1.0)

      val mem = MemoryStream[Ev]
      val q = EventStreams.asOfEnrichLatestClick(mem.toDF())
        .toDF("user_id", "err_ts_ms", "click_ts_ms", "click_cents")
        .writeStream.format("memory").queryName("asof_enrich_out")
        .outputMode("append").start()
      // ts-ordered across micro-batches — the documented ordering contract
      mem.addData(data.take(30))
      q.processAllAvailable()
      mem.addData(data.drop(30))   // state must carry the buffered click over
      q.processAllAvailable()
      q.stop()

      val streamed = spark.table("asof_enrich_out")
        .orderBy("user_id", "err_ts_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq

      val df = data.toDF()
      val errors = df.filter(col("event_type") === "error")
        .select(col("user_id"), unix_millis(col("ts")).as("err_ts_ms"))
      val clicks = df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), unix_millis(col("ts")).as("click_ts_ms"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("click_cents"))
      val batch = graft.ops.Joins.asofBackward(errors, clicks,
          Seq("user_id"), Seq("c_user"), "err_ts_ms", "click_ts_ms")
        .select("user_id", "err_ts_ms", "click_ts_ms", "click_cents")
        .orderBy("user_id", "err_ts_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState SCD2 changelog == batch change detection across batches") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // 3 users, strictly increasing ts, types that repeat AND change so
      // both the suppress-repeat and emit-change paths run; the chunk
      // boundary lands mid-run for user 1 so state must carry over
      val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
      val types = Seq("view", "view", "click", "click", "click", "purchase",
        "view", "purchase", "purchase", "click")
      val data = (0 until 60).map { i =>
        Ev(new java.sql.Timestamp(base.getTime + i * 60000L), i % 3,
          types((i / 3) % types.length), 1.0)
      }

      val mem = MemoryStream[Ev]
      val q = EventStreams.scd2Changes(mem.toDF())
        .toDF("user_id", "version", "state", "valid_from_ms")
        .writeStream.format("memory").queryName("scd2_out")
        .outputMode("append").start()
      mem.addData(data.take(31))   // boundary mid-run
      q.processAllAvailable()
      mem.addData(data.drop(31))
      q.processAllAvailable()
      q.stop()

      val streamed = spark.table("scd2_out")
        .orderBy("user_id", "version")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3))).toSeq

      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tsm")
      val batch = data.toDF()
        .select(col("user_id"),
          unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tsm"),
          col("event_type"))
        .withColumn("prevT", lag("event_type", 1).over(w))
        .filter(col("prevT").isNull || col("prevT") =!= col("event_type"))
        .withColumn("version", row_number().over(w).cast("long"))
        .select("user_id", "version", "event_type", "tsm")
        .orderBy("user_id", "version")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3))).toSeq

      assert(streamed.nonEmpty && streamed == batch)
      // repeats were genuinely suppressed: fewer changes than events
      assert(streamed.length < data.length)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }

  test("flatMapGroupsWithState sessionizer == built-in session_window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionizeWithState(mem.toDF(), gapMs = 600000L,
        watermark = "1 minute")
      .toDF()
      .writeStream.format("memory").queryName("custom_session_out")
      .outputMode("append").start()
    mem.addData(evs)
    q.processAllAvailable()
    // advance the watermark far enough to time out every open session
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("custom_session_out")
      .filter(col("user_id") =!= 99L)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .orderBy("user_id", "session_start").collect().toSeq
    val builtin = EventStreams.sessions(evs.toDF())
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed == builtin)
  }

  test("session window: streaming (append, watermarked) == batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessions(mem.toDF(), gap = "10 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    mem.addData(evs)
    q.processAllAvailable()
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("session_out")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = EventStreams.sessions(evs.toDF())
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed == batch)
  }

  test("stream-stream interval join (watermark-bounded state) == batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // clicks every 7 min per user; errors every 11 min — some inside, some
    // outside the 15-minute horizon, some for users with no clicks
    val data: Seq[Ev] =
      (0 until 60).map(i => Ev(new java.sql.Timestamp(base.getTime + i * 7 * 60000L),
        i % 3, "click", i + 0.5)) ++
      (0 until 40).map(i => Ev(new java.sql.Timestamp(base.getTime + i * 11 * 60000L + 30000L),
        i % 4, "error", i + 0.25))

    val mem = MemoryStream[Ev]
    val q = EventStreams.clickErrorPairs(mem.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    mem.addData(data)
    q.processAllAvailable()
    // advance both watermarks far enough to flush all buffered state
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "click", 0.0))
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 99L, "error", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ssjoin_out")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "c_ts", "e_ts").collect().toSeq
    val batch = EventStreams.clickErrorPairs(data.toDF())
      .orderBy("user_id", "c_ts", "e_ts").collect().toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-static join enriches each micro-batch against a static dim") {
    // Stream-static joins are their own execution path: no state store,
    // the static side re-planned per micro-batch. Enrich the event stream
    // with a static cohort dimension and compare to the batch join.
    implicit val sqlCtx = spark.sqlContext
    val cohorts = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("user_id", "cohort")
    val mem = MemoryStream[Ev]
    val q = mem.toDF().join(cohorts, Seq("user_id"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("static_join_out")
      .outputMode("complete").start()
    mem.addData(evs)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("static_join_out")
      .orderBy("cohort").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = evs.toDF().join(cohorts, Seq("user_id"))
      .groupBy("cohort").agg(count(lit(1)).as("n"))
      .orderBy("cohort").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-stream LEFT OUTER interval join emits proven-absent rows == batch") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val data: Seq[Ev] =
      (0 until 30).map(i => Ev(new java.sql.Timestamp(base.getTime + i * 31 * 60000L),
        i % 3, "click", i + 0.5)) ++
      (0 until 10).map(i => Ev(new java.sql.Timestamp(base.getTime + i * 97 * 60000L + 30000L),
        i % 2, "error", i + 0.25))

    val mem = MemoryStream[Ev]
    val q = EventStreams.clickErrorPairs(mem.toDF(), watermark = "1 minute",
        joinType = "leftOuter")
      .writeStream.format("memory").queryName("ssjoin_outer_out")
      .outputMode("append").start()
    mem.addData(data)
    q.processAllAvailable()
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 99L, "click", 0.0))
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 99L, "error", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ssjoin_outer_out")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "c_ts", "e_ts").collect().toSeq
    val batch = EventStreams.clickErrorPairs(data.toDF(), joinType = "leftOuter")
      .orderBy("user_id", "c_ts", "e_ts").collect().toSeq
    val nullMatched = streamed.count(_.isNullAt(2))
    assert(nullMatched > 0, "expected some clicks with proven-absent errors")
    assert(streamed == batch)
  }
  test("flatMapGroupsWithState token bucket == batch recurrence replay") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 3 users, one event per 2 s of stream time -> 6 s between a user's
    // events = 0.6 token refill per 1-token cost: the 5-token burst
    // drains after ~10 events, then denials alternate with refill grants
    val data = (0 until 120).map { i =>
      EvR(i.toLong, new java.sql.Timestamp(base.getTime + i * 2000L), i % 3)
    }
    val mem = MemoryStream[EvR]
    val q = EventStreams.rateLimit(mem.toDF())
      .writeStream.format("memory").queryName("ratelimit_out")
      .outputMode("append").start()
    // two micro-batches: state (tokens, last ts) must carry across
    val (a, b) = data.splitAt(60)
    mem.addData(a); q.processAllAvailable()
    mem.addData(b); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ratelimit_out").orderBy("event_id")
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))

    val expected = data.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      var tokens = 0L; var prev = 0L; var first = true
      evs.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        val tms = e.ts.getTime
        val before =
          if (first) 5000000L
          else math.min(5000000L, tokens + (tms - prev) * 100L)
        first = false; prev = tms
        val allowed = before >= 1000000L
        tokens = if (allowed) before - 1000000L else before
        (e.event_id, uid, allowed, tokens)
      }
    }.sortBy(_._1)

    assert(streamed.count(!_._3) > 0, "scenario must produce denials")
    assert(streamed.count(_._3) > 30, "burst + refill grants expected")
    assert(streamed == expected)
  }

  test("streaming CUSUM (transformWithState) == batch q_events_cusum across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the batch query derives its reference rate from the full corpus;
      // feed those totals to the stream as the calibrated target
      val daily = Tables.events(spark, sf)
        .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
          .as("day"))
        .groupBy("day").agg(count(lit(1)).as("x"))
      val tot = daily.agg(sum("x"), count(lit(1))).head()
      val (tUnits, nDays) = (tot.getLong(0), tot.getLong(1))

      // real events in event-time order, split in three so days span
      // micro-batch boundaries (several days per third, splits mid-day)
      val real = Tables.events(spark, sf)
        .select(col("ts"), col("user_id"), col("event_type"), col("value"))
        .collect()
        .sortBy(_.getTimestamp(0).getTime)
        .map(r => Ev(r.getTimestamp(0), r.getLong(1), r.getString(2),
          r.getDouble(3)))
        .toSeq
      val mem = MemoryStream[Ev]
      val q = streaming.CusumStream.streamingCusum(mem.toDF(), tUnits, nDays)
        .writeStream.format("memory").queryName("cusum_out")
        .outputMode("append").start()
      val third = real.length / 3
      mem.addData(real.take(third)); q.processAllAvailable()
      mem.addData(real.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(real.drop(2 * third)); q.processAllAvailable()
      q.stop()

      val streamed = spark.table("cusum_out").orderBy("day")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSeq
      val batch = SparkEntry.queries("q_events_cusum")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSeq
      // the stream emits a day when the NEXT day opens: every batch row
      // except the final (still-open) day must match bit-for-bit
      assert(streamed == batch.dropRight(1))
      assert(streamed.size >= 3, "fixture must close several days")
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }
}
