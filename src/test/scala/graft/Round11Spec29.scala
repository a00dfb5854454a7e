package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 27 (Ljung–Box, embedding outliers). */
class Round11Spec29 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_stats_ljungbox equals driver brute force; Q non-negative") {
    val rows = run("q_stats_ljungbox").collect()
      .map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Double]("rho"), r.getAs[Double]("q_stat")))).toMap
    val daily = Tables.events(spark, sf)
      .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .groupBy("day").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val sx = daily.map(_._2).sum
    val ys = daily.map(d => (n * d._2 - sx).toDouble)
    val denom = ys.map(y => y * y).sum
    var q = 0.0
    (1 to 7).foreach { k =>
      val num = (0 until (ys.length - k)).map(i => ys(i) * ys(i + k)).sum
      val rho = num / denom
      assert(math.abs(rows(k.toLong)._1 - rho) < 1e-9, s"lag $k rho")
      q += rho * rho / (n - k).toDouble
    }
    q *= n.toDouble * (n + 2).toDouble
    assert(math.abs(rows(0L)._2 - q) < 1e-6, s"Q ${rows(0L)._2} vs $q")
    assert(rows(0L)._2 >= 0.0)
  }

  test("q_emb_outliers: flags exactly the >1.05x-mean-dist2 tail; ratio consistent") {
    val rows = run("q_emb_outliers").collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("dist2"), r.getAs[Double]("ratio")))
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    // replicate: fixed-point centroid, double fold dist2, dfx threshold
    val cents = data.groupBy(_._2).view.mapValues { vs =>
      (0 until 64).map { i =>
        vs.map(v => math.floor(v._3(i).toDouble * 1e8).toLong).sum
          .toDouble / 1e8 / vs.length
      }.toArray
    }.toMap
    val dists = data.map { case (id, lab, v) =>
      var d2 = 0.0
      val c = cents(lab)
      for (i <- 0 until 64) {
        val t = v(i).toDouble - c(i); d2 += t * t
      }
      (lab, id, d2, math.floor(d2 * 1e9).toLong)
    }
    val stats = dists.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._4).sum)).toMap
    val expect = dists.filter { case (lab, _, _, dfx) =>
      val (nc, sum) = stats(lab)
      dfx * nc * 20 > 21 * sum
    }.map(t => (t._1, t._2)).toSet
    assert(rows.map(t => (t._1, t._2)).toSet == expect,
      s"flag sets differ: got ${rows.length} want ${expect.size}")
    assert(rows.nonEmpty, "threshold must flag a tail on this corpus")
    rows.foreach { case (lab, _, _, ratio) =>
      assert(ratio > 1.05 - 1e-9, s"label $lab ratio $ratio")
    }
  }
}
