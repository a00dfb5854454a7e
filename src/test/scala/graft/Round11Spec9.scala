package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 8 (k-center coreset, Cohen's kappa). */
class Round11Spec9 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_curation_coreset: greedy farthest-point matches driver brute force") {
    val rows = run("q_curation_coreset").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("dmin")))
    assert(rows.length == 8 && rows.map(_._1).toSeq == (0L to 7L))
    // brute force on the driver with the same quantization
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toMap
    def qdist(a: IndexedSeq[Double], b: IndexedSeq[Double]): Long = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      math.floor(acc * 1e8).toLong
    }
    var sel = Vector(0L)
    var expect = Vector((0L, 0L, 0L))
    for (k <- 1 until 8) {
      val best = vecs.keys.filterNot(sel.contains).map { id =>
        val dmin = sel.map(c => qdist(vecs(id), vecs(c))).min
        (id, dmin)
      }.toSeq.maxBy { case (id, dm) => (dm, -id) }
      sel :+= best._1
      expect :+= ((k.toLong, best._1, best._2))
    }
    assert(rows.toSeq == expect, s"${rows.toSeq} != $expect")
    // greedy invariant: selection distances never increase
    val dm = rows.drop(1).map(_._3)
    assert(dm.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q_quality_kappa: cells partition the corpus; kappa formula pinned") {
    val r = run("q_quality_kappa").collect().head
    val n = r.getAs[Long]("n")
    val (n11, n10, n01, n00) = (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n == n11 + n10 + n01 + n00)
    assert(n == Tables.documents(spark, sf).count())
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-12)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1.0 - pe)) < 1e-12)
    assert(r.getAs[Double]("kappa") <= 1.0)
  }
}
