package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 7 (Kaplan-Meier survival, RRF hybrid
  * retrieval fusion). */
class Round11Spec8 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_events_survival: matches driver-side KM brute force; curve monotone") {
    val rows = run("q_events_survival").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("churned"), r.getAs[Long]("censored"),
        r.getAs[Long]("s_micro")))
    // brute force from raw events
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wend = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).values.map { es =>
      val ts = es.map(_._2)
      val (first, last) = (ts.min, ts.max)
      ((last - first) / 86400000L, last >= wend - 7L * 86400000L)
    }.toSeq
    val byDay = perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, us) =>
      (t, us.count(!_._2).toLong, us.count(_._2).toLong)
    }
    var atRisk = perUser.size.toLong
    var s = 1000000L
    val expected = byDay.map { case (t, d, c) =>
      val n = atRisk
      s = s * (n - d) / n
      atRisk -= (d + c)
      (t, n, d, c, s)
    }
    assert(rows.toSeq == expected, s"${rows.toSeq} != $expected")
    // survival curve never increases; all users accounted for
    assert(rows.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(rows.map(r => r._3 + r._4).sum == perUser.size)
  }

  test("q_similarity_rrf: fused order re-derivable from the member ranks") {
    val rows = run("q_similarity_rrf").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("fused_rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("r_bm25"),
        r.getAs[Long]("r_cos"), r.getAs[Double]("rrf")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, qs) =>
      // rrf value matches its definition from the two ranks
      qs.foreach { case (_, _, _, rb, rc, rrf) =>
        val expect = (if (rb == 0) 0.0 else 1.0 / (60.0 + rb)) +
          (if (rc == 0) 0.0 else 1.0 / (60.0 + rc))
        assert(math.abs(rrf - expect) < 1e-12)
        assert(rb >= 0 && rb <= 20 && rc >= 0 && rc <= 20)
        assert(rb > 0 || rc > 0)
      }
      // fused_rank is the (rrf desc, doc_id asc) order and 1..k dense
      val sorted = qs.sortBy(q => (-q._6, q._3)).map(_._2).toSeq
      assert(sorted == sorted.sorted && sorted.head == 1L)
      assert(qs.map(_._2).sorted.toSeq == (1L to qs.length).toSeq)
      // a doc ranked #1 by BOTH lists must fuse to #1
      qs.find(q => q._4 == 1 && q._5 == 1)
        .foreach(q => assert(q._2 == 1L))
    }
  }
}
