package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 18 (VAD segments, max drawdown). */
class Round11Spec20 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_multimodal_vad: segments are maximal active runs consistent with q_multimodal_audio") {
    val frames = run("q_multimodal_audio").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame"),
        r.getAs[Long]("ss"), r.getAs[Boolean]("is_silence")))
    val segs = run("q_multimodal_vad").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_frame"),
        r.getAs[Long]("end_frame"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("ss_total")))
    // driver brute force: group consecutive active frames per doc
    val expect = frames.groupBy(_._1).toSeq.flatMap { case (doc, fs) =>
      val active = fs.filter(!_._4).sortBy(_._2)
      val runs = scala.collection.mutable.ArrayBuffer.empty[List[(Long, Long, Long)]]
      active.foreach { case (_, fr, ss, _) =>
        if (runs.nonEmpty && runs.last.last._1 == fr - 1)
          runs(runs.length - 1) = runs.last :+ ((fr, ss, 0L))
        else runs += List((fr, ss, 0L))
      }
      runs.map(run => (doc, run.head._1, run.last._1, run.length.toLong,
        run.map(_._2).sum))
    }.sortBy(s => (s._1, s._2))
    assert(segs.sortBy(s => (s._1, s._2)).toSeq == expect.toSeq)
    // segments are dense runs: end - start + 1 == n_frames
    segs.foreach { case (d, st, en, n, _) =>
      assert(en - st + 1 == n, s"doc $d segment [$st,$en] not dense")
    }
  }

  test("q_window_drawdown equals driver brute force; drawdown non-negative") {
    val rows = run("q_window_drawdown").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("maxdd_micro"),
          r.getAs[Long]("peak_micro")))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
        col("event_id"), col("value").cast("decimal(18,6)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3)))
    ev.groupBy(_._1).foreach { case (u, es) =>
      val vs = es.sortBy(e => (e._2, e._3)).map(_._4)
      var cum = BigDecimal(0); var peak = BigDecimal(Long.MinValue)
      var maxdd = BigDecimal(Long.MinValue); var maxpeak = BigDecimal(Long.MinValue)
      vs.foreach { v =>
        cum += BigDecimal(v)
        peak = peak.max(cum)
        maxdd = maxdd.max(peak - cum)
        maxpeak = maxpeak.max(peak)
      }
      val (n, dd, pk) = rows(u)
      assert(n == vs.length, s"user $u n")
      assert(BigDecimal(dd) == maxdd * 1000000, s"user $u maxdd $dd vs ${maxdd * 1000000}")
      assert(BigDecimal(pk) == maxpeak * 1000000, s"user $u peak")
      assert(dd >= 0L)
    }
    assert(rows.size == ev.map(_._1).distinct.length)
  }
}
