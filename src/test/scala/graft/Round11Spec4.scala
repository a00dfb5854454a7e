package graft

import org.apache.spark.sql.functions._

/** Contracts for the round-11 drift-stats batch (KS, PSI), each checked
  * against a driver-side brute-force reference. */
class Round11Spec4 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_stats_ks equals the brute-force two-sample KS statistic") {
    val vals = Tables.orders(spark, sf)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("u"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val s1 = vals.filter(_._2).map(_._1).sorted
    val s2 = vals.filterNot(_._2).map(_._1).sorted
    val axis = (s1 ++ s2).distinct.sorted
    var best = 0L; var bestAt = Long.MaxValue
    axis.foreach { v =>
      val c1 = s1.count(_ <= v).toLong; val c2 = s2.count(_ <= v).toLong
      val dn = math.abs(c1 * s2.length - c2 * s1.length)
      if (dn > best) { best = dn; bestAt = v }
      else if (dn == best && v < bestAt) bestAt = v
    }
    val r = run("q_stats_ks").collect().head
    assert(r.getAs[Long]("n1") == s1.length.toLong &&
      r.getAs[Long]("n2") == s2.length.toLong)
    assert(r.getAs[Long]("d_num") == best, s"D numerator: $r vs $best")
    assert(r.getAs[Long]("ks_at") == bestAt)
    assert(r.getAs[Double]("ks_d") ==
      best.toDouble / (s1.length.toLong * s2.length).toDouble)
  }

  test("q_stats_psi: PSI is non-negative and the summary equals the term sum") {
    val rows = run("q_stats_psi").collect()
    val terms = rows.filter(_.getLong(0) >= 0L)
    val total = rows.filter(_.getLong(0) == -1L).head.getAs[Double]("psi_term")
    assert(terms.nonEmpty)
    // each term (p−q)·ln(p/q) is individually non-negative
    terms.foreach(t => assert(t.getAs[Double]("psi_term") >= -1e-15, s"$t"))
    assert(total >= 0.0)
    // sum in bucket order reproduces the summary row exactly (the fold)
    val fold = terms.sortBy(_.getLong(0))
      .foldLeft(0.0)((a, t) => a + t.getAs[Double]("psi_term"))
    assert(fold == total, s"fold $fold vs summary $total")
  }
}
