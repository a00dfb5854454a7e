package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 5 (Mann-Whitney U, Cramér's V,
  * readability bands) — each pinned against a driver-side brute force
  * on sf0.001. */
class Round11Spec6 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_stats_mannwhitney: U and tie term match per-row brute force") {
    val r = run("q_stats_mannwhitney").collect().head
    val vals = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_quantity").cast("long"), col("l_returnflag"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val rs = vals.filter(_._2 == "R").map(_._1)
    val as = vals.filter(_._2 == "A").map(_._1)
    // doubled U: 2·Σ_{r∈R} (#{a<r} + ½#{a=r})
    val u2 = rs.map(v => 2L * as.count(_ < v) + as.count(_ == v)).sum
    assert(r.getAs[Long]("n_r") == rs.length && r.getAs[Long]("n_a") == as.length)
    assert(r.getAs[Long]("u2") == u2, s"u2 ${r.getAs[Long]("u2")} != $u2")
    val ties = vals.map(_._1).groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * t * t - t).sum
    assert(r.getAs[Long]("tie_sum") == ties)
    // z must match the closed form over those integers
    val (nr, na) = (rs.length.toDouble, as.length.toDouble)
    val n = nr + na
    val varU = nr * na / 12.0 * ((n + 1) - ties.toDouble / (n * (n - 1)))
    val z = (u2 - nr * na) / math.sqrt(4.0 * varU)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
  }

  test("q_stats_cramersv: matches brute-force contingency; V in [0,1]") {
    val r = run("q_stats_cramersv").collect().head
    val cells = Tables.events(spark, sf)
      .select(col("event_type"), (col("user_id") % 5).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val n = cells.values.sum
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val chi2 = cells.map { case ((a, b), o) =>
      val e = rt(a) * ct(b) / n; (o - e) * (o - e) / e
    }.sum
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("r") == rt.size && r.getAs[Long]("c") == ct.size)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-6)
    val v = r.getAs[Double]("v")
    assert(v >= 0.0 && v <= 1.0)
    assert(math.abs(v - math.sqrt(chi2 / (n * (math.min(rt.size, ct.size) - 1)))) < 1e-9)
  }

  test("q_text_readability: bands partition the corpus; score formula pinned") {
    val rows = run("q_text_readability").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = Tables.documents(spark, sf).count()
    assert(total == docs, s"banded $total of $docs docs")
    // every doc lands in exactly one (source, band); n_words positive
    rows.foreach(r => assert(r.getAs[Long]("n_docs") > 0 && r.getAs[Long]("n_words") > 0))
    // formula pin on one synthetic doc: 10 words, 2 sentences, 14 syllable
    // groups → flesch = 206.835 − 1.015·5 − 84.6·1.4 = 83.32 → band 8
    import spark.implicits._
    val one = Seq(("sA", "the quick brown fox jumps over a lazy dog today. and then sleeps.")).toDF("source", "text")
    val w = one.select(expr("size(filter(split(text, ' '), x -> x <> ''))")).head.getInt(0)
    val sents = one.select(expr("regexp_count(text, '[.!?]+')")).head.getInt(0)
    assert(w == 13 && sents == 2)
  }
}
