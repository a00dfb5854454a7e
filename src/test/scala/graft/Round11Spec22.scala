package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 20 (code detection, Benford audit). */
class Round11Spec22 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_quality_code_detect equals driver brute-force rule battery") {
    val rows = run("q_quality_code_detect").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("hits_symbols"),
          r.getAs[Long]("hits_brackets"), r.getAs[Long]("hits_vowels"),
          r.getAs[Long]("n_code")))).toMap
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.filter(_._2.nonEmpty).groupBy(_._1).view.mapValues { g =>
      val scored = g.map { case (_, t) =>
        val c = t.length.toLong
        val sy = t.count("{}()[];=<>+*/&|^%#@!~`\\-".contains(_)).toLong
        val br = t.count("{}()[]".contains(_)).toLong
        val vo = t.toLowerCase.count("aeiou".contains(_)).toLong
        val rSym = if (4 * sy > c) 1L else 0L
        val rBr = if (100 * br >= 8 * c) 1L else 0L
        val rVow = if (5 * vo < c) 1L else 0L
        (rSym, rBr, rVow, if (rSym + rBr + rVow >= 2) 1L else 0L)
      }
      (g.length.toLong, scored.map(_._1).sum, scored.map(_._2).sum,
        scored.map(_._3).sum, scored.map(_._4).sum)
    }.toMap
    assert(rows.keySet == expect.keySet)
    expect.foreach { case (src, e) =>
      assert(rows(src) == e, s"source $src: got ${rows(src)} want $e")
    }
  }

  test("q_stats_benford: expectations sum to ~1, chi2 equals term sum, counts tile") {
    val rows = run("q_stats_benford").collect()
    val digits = rows.filter(_.getAs[Long]("digit") >= 1L)
    val summary = rows.find(_.getAs[Long]("digit") == 0L).get
    val n = Tables.orders(spark, sf).count()
    assert(digits.map(_.getAs[Long]("obs")).sum == n)
    assert(summary.getAs[Long]("obs") == n)
    // Benford probabilities over ALL 9 digits sum to 1 (present digits
    // may be fewer on a degenerate corpus; here all 9 appear)
    assert(digits.length == 9)
    val psum = digits.map(_.getAs[Double]("p_benford")).sum
    assert(math.abs(psum - 1.0) < 1e-12, s"p sum $psum")
    digits.foreach { r =>
      val d = r.getAs[Long]("digit")
      val p = r.getAs[Double]("p_benford")
      assert(math.abs(p - math.log(1.0 + 1.0 / d) / math.log(10.0)) < 1e-12)
      val e = r.getAs[Double]("expected")
      val o = r.getAs[Long]("obs")
      assert(math.abs(r.getAs[Double]("chi2_term") - (o - e) * (o - e) / e) < 1e-9)
    }
    val chi2 = digits.map(_.getAs[Double]("chi2_term")).sum
    assert(math.abs(summary.getAs[Double]("chi2_term") - chi2) < 1e-9)
    // synthetic prices are NOT Benford-distributed — the audit must flag
    assert(summary.getAs[Double]("chi2_term") > 21.67, "chi2 should reject at p=0.01")
  }
}
