package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 25 (embedding diversity, stickiness). */
class Round11Spec27 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_emb_diversity: closed form equals the brute-force pairwise mean on quantized lanes") {
    val rows = run("q_emb_diversity").collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean_cos"),
          r.getAs[Double]("diversity")))).toMap
    val data = Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    data.groupBy(_._1).foreach { case (lab, vs) =>
      if (vs.length >= 2) {
        // quantize exactly as the query: floor((v/||v||)*1e8)
        val qs = vs.map { case (_, v) =>
          var d2 = 0.0
          for (i <- v.indices) d2 += v(i).toDouble * v(i).toDouble
          val nrm = math.sqrt(d2)
          v.map(x => math.floor((x.toDouble / nrm) * 1e8).toLong)
        }
        var pairSum = BigInt(0)
        for (i <- qs.indices; j <- qs.indices if i != j)
          pairSum += (0 until 64).map(k => BigInt(qs(i)(k)) * qs(j)(k)).sum
        val n = qs.length
        val brute = pairSum.toDouble / (n.toLong * n - n) / 1e16
        val (gn, gc, gd) = rows(lab)
        assert(gn == n)
        assert(math.abs(gc - brute) < 1e-9, s"label $lab mean_cos $gc vs $brute")
        assert(math.abs(gd - (1.0 - gc)) < 1e-12)
        assert(gc > -1.001 && gc < 1.001)
      }
    }
  }

  test("q_events_stickiness equals driver brute force; ratio in (0, 1]") {
    val rows = run("q_events_stickiness").collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Double]("stickiness")))).toMap
    val du = Tables.events(spark, sf)
      .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long"),
        col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = du.map(_._1).distinct
    days.foreach { day =>
      val dau = du.count(_._1 == day).toLong
      val wau = du.filter(e => e._1 >= day - 6 && e._1 <= day)
        .map(_._2).distinct.length.toLong
      val (gd, gw, ratio) = rows(day)
      assert(gd == dau && gw == wau, s"day $day: got ($gd,$gw) want ($dau,$wau)")
      assert(math.abs(ratio - dau.toDouble / wau) < 1e-12)
      assert(ratio > 0.0 && ratio <= 1.0)
    }
    assert(rows.keySet == days.toSet)
  }
}
