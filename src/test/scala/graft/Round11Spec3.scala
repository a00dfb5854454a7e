package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 2 (bitmap distinct, nearest as-of,
  * CEP funnels, ROUGE-1): each checked against an independent
  * driver-side reference, not the query's own machinery. */
class Round11Spec3 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_agg_bitmap_distinct equals exact distincts incl. the rollup row") {
    val rows = run("q_agg_bitmap_distinct").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val ev = Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (t, es) =>
      assert(rows(t) == es.map(_._2).distinct.length.toLong, s"type $t")
    }
    assert(rows("__all__") == ev.map(_._2).distinct.length.toLong)
  }

  test("q_join_nearest_tolerance picks the true argmin within the window") {
    val clicks = Tables.events(spark, sf).filter(col("event_type") === "click")
      .groupBy(col("user_id"), date_trunc("MILLISECOND", col("ts")).as("cts"))
      .agg(max("event_id").as("cid")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = run("q_join_nearest_tolerance").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, et) = (r.getLong(0), r.getTimestamp(2).getTime)
      val cands = clicks.filter(c => c._1 == u && math.abs(c._2 - et) <= 1800000L)
      if (cands.isEmpty) {
        assert(r.getAs[Long]("click_id") == -1L && r.getAs[Long]("delta_ms") == -1L)
      } else {
        val best = cands.minBy(c => (math.abs(c._2 - et), c._2, c._3))
        assert(r.getAs[Long]("click_id") == best._3 &&
          r.getAs[Long]("delta_ms") == math.abs(best._2 - et), s"row $r")
      }
    }
  }

  test("q_events_cep equals a brute-force greedy automaton") {
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = evs.groupBy(_._1).view.mapValues { es =>
      var st = 0; var cnt = 0L; var anchor = 0L
      es.sortBy(e => (e._2, e._3)).foreach { case (_, tm, _, ty) =>
        if (st > 0 && tm - anchor > 172800000L) { st = 0; anchor = 0L }
        (st, ty) match {
          case (0, "view") => st = 1; anchor = tm
          case (1, "click") => st = 2
          case (2, "purchase") => st = 0; cnt += 1; anchor = 0L
          case _ =>
        }
      }
      cnt
    }.toMap
    val got = run("q_events_cep").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_funnels")).toMap
    assert(got == expect)
    assert(got.values.sum > 0, "fixture must contain at least one full funnel")
  }

  test("q_text_rouge: clipped overlap bounded by both lengths; F between P and R") {
    val rows = run("q_text_rouge").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ov, n1, n2) = (r.getAs[Long]("overlap"), r.getAs[Long]("n1"),
        r.getAs[Long]("n2"))
      assert(ov <= math.min(n1, n2))
      val (p, rc, f) = (r.getAs[Double]("rouge1_p"), r.getAs[Double]("rouge1_r"),
        r.getAs[Double]("rouge1_f"))
      assert(f >= math.min(p, rc) - 1e-12 && f <= math.max(p, rc) + 1e-12)
    }
    // planted near-dups exist → some pair overlaps heavily
    assert(rows.exists(_.getAs[Double]("rouge1_f") > 0.5))
  }
}
