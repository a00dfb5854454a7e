package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 29 (Heaps' law, RBO). */
class Round11Spec31 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_text_heaps: beta matches brute-force log-log OLS; 0 < beta < 1") {
    val r = run("q_text_heaps").collect().head
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1))).sortBy(_._1)
    var cumToks = 0L
    val seen = scala.collection.mutable.Set.empty[String]
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    docs.foreach { case (_, text) =>
      val ws = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      cumToks += ws.length
      ws.foreach(seen += _)
      if (cumToks > 0 && seen.nonEmpty) pts += ((cumToks, seen.size.toLong))
    }
    val fx = pts.map { case (x, y) =>
      (math.floor(math.log(x.toDouble) * 1e12).toLong,
        math.floor(math.log(y.toDouble) * 1e12).toLong)
    }
    val n = fx.length.toDouble
    val sx = fx.map(_._1.toDouble).sum; val sy = fx.map(_._2.toDouble).sum
    val sxx = fx.map(p => p._1.toDouble * p._1).sum
    val sxy = fx.map(p => p._1.toDouble * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getAs[Long]("n") == pts.length)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-6,
      s"beta ${r.getAs[Double]("beta")} vs $beta")
    assert(r.getAs[Double]("beta") > 0.0 && r.getAs[Double]("beta") < 1.0)
    val lnK = (sy - beta * sx) / n / 1e12
    assert(math.abs(r.getAs[Double]("ln_k") - lnK) < 1e-6)
  }

  test("q_similarity_rbo: terms consistent; RBO in [0, 1 - p^10 scale]; self-consistency") {
    val rows = run("q_similarity_rbo").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("depth"),
        r.getAs[Long]("overlap"), r.getAs[Double]("agreement"),
        r.getAs[Double]("pw"), r.getAs[Double]("rbo_term")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, g) =>
      val depths = g.filter(_._2 > 0).sortBy(_._2)
      assert(depths.map(_._2).toSeq == (1L to 10L))
      // overlap monotone non-decreasing, bounded by depth
      depths.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 >= a._3)
        case _ =>
      }
      depths.foreach { t =>
        assert(t._3 >= 0 && t._3 <= t._2)
        assert(math.abs(t._4 - t._3.toDouble / t._2) < 1e-12)
        assert(math.abs(t._5 - math.pow(0.9, (t._2 - 1).toDouble)) < 1e-9)
        assert(math.abs(t._6 - 0.1 * t._5 * t._4) < 1e-12)
      }
      val summary = g.find(_._2 == 0L).get
      val expect = depths.map(_._6).sum
      assert(math.abs(summary._6 - expect) < 1e-9, s"q $q RBO")
      // truncated RBO bounded by the total truncated weight
      val wTot = (1 to 10).map(d => 0.1 * math.pow(0.9, d - 1.0)).sum
      assert(summary._6 >= 0.0 && summary._6 <= wTot + 1e-12)
    }
  }
}
