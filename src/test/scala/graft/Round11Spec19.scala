package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 17 (Spearman ρ, annealed mix weights). */
class Round11Spec19 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_stats_spearman equals driver brute-force midrank Pearson; |rho| <= 1") {
    val row = run("q_stats_spearman").collect().head
    val data = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def midranks[T](vs: Seq[T])(implicit ord: Ordering[T]): Map[T, Double] = {
      val grouped = vs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      var before = 0L
      grouped.map { case (v, t) =>
        val mr = before + (t + 1) / 2.0
        before += t
        v -> mr
      }.toMap
    }
    val rx = midranks(data.map(_._1).toSeq)
    val ry = midranks(data.map(_._2).toSeq)
    val xs = data.map(d => rx(d._1))
    val ys = data.map(d => ry(d._2))
    val n = data.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = row.getAs[Double]("rho")
    assert(row.getAs[Long]("n") == data.length)
    assert(math.abs(got - rho) < 1e-9, s"rho $got vs brute $rho")
    assert(got >= -1.0 - 1e-12 && got <= 1.0 + 1e-12)
  }

  test("q_mix_anneal: epoch 0 uniform, final epoch proportional, rows sum to 1") {
    val rows = run("q_mix_anneal").collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[String]("source"),
        r.getAs[Long]("n_source"), r.getAs[Double]("weight")))
    val k = rows.map(_._2).distinct.length
    val n = rows.filter(_._1 == 0L).map(_._3).sum.toDouble
    // every epoch's weights sum to 1
    rows.groupBy(_._1).foreach { case (e, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-12, s"epoch $e sum")
      assert(g.length == k)
    }
    // epoch 0: uniform
    rows.filter(_._1 == 0L).foreach { case (_, src, _, w) =>
      assert(math.abs(w - 1.0 / k) < 1e-12, s"$src epoch0 $w")
    }
    // last epoch: corpus-proportional
    rows.filter(_._1 == 4L).foreach { case (_, src, ns, w) =>
      assert(math.abs(w - ns / n) < 1e-12, s"$src epoch4 $w")
    }
  }
}
