package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 3 (Markov stationary distribution,
  * scene-cut detection). */
class Round11Spec5 extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_events_markov_stationary: mass conserved up to floor leak, matches brute force") {
    val rows = run("q_events_markov_stationary").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("stationary_micro")).toMap
    assert(rows.size >= 2)
    val types = rows.keys.toSeq.sorted
    // brute-force the same integer iteration on the driver
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowtot = pairs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p = pairs.map { case ((a, b), c) => (a, b) -> c * 1000000L / rowtot(a) }
    var v = types.map(_ -> 1000000L).toMap
    for (_ <- 1 to 8)
      v = types.map(t => t -> types.map(a =>
        v(a) * p.getOrElse((a, t), 0L) / 1000000L).sum).toMap
    assert(rows == v, s"got $rows expected $v")
    // total micro-mass stays positive and below the starting mass
    // (floor division + chain-end leak only ever lose mass)
    assert(rows.values.sum > 0 && rows.values.sum <= types.size * 1000000L)
  }


  test("q_mix_budget_waterfill: max-min fair, budget-respecting, brute-force level") {
    val rows = run("q_mix_budget_waterfill").collect()
    val per = rows.filter(_.getString(0) != "__total__")
    val tot = rows.find(_.getString(0) == "__total__").get
    val budget = tot.getAs[Long]("n_tokens") / 2
    assert(tot.getAs[Long]("allocation") <= budget)
    per.foreach { r =>
      assert(r.getAs[Long]("allocation") <= r.getAs[Long]("n_tokens"))
    }
    assert(per.map(_.getAs[Long]("allocation")).sum == tot.getAs[Long]("allocation"))
    // brute-force the level on the driver and re-derive every quota
    val caps = per.map(r => r.getString(0) -> r.getAs[Long]("n_tokens")).toMap
    def spend(theta: Long) = caps.values.map(math.min(_, theta)).sum
    if (spend(Long.MaxValue / 2) > budget) {
      // largest integer theta with spend <= budget (binary search)
      var lo = 0L; var hi = caps.values.max
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (spend(mid) <= budget) lo = mid else hi = mid - 1
      }
      per.foreach { r =>
        val expect = math.min(caps(r.getString(0)), lo)
        assert(r.getAs[Long]("allocation") == expect,
          s"${r.getString(0)}: got ${r.getAs[Long]("allocation")} expect $expect (theta=$lo)")
        assert(r.getAs[Boolean]("saturated") == (caps(r.getString(0)) > lo))
      }
      assert(per.exists(_.getAs[Boolean]("saturated")),
        "half-the-corpus budget must saturate some source")
    }
  }

  test("q_multimodal_scenecut: repetitive docs cohere, alternating topics cut") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scut").toString
    val coherent = (("alpha beta gamma delta epsilon zeta eta theta ") * 8).trim
    val shifting = (("alpha beta gamma delta epsilon zeta eta theta ") * 2 +
      ("iota kappa lambda mu nu xi omicron pi ") * 2).trim
    Seq((1L, coherent, "en", "web", 0L), (2L, shifting, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_multimodal_scenecut")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
          r.getAs[Long]("first_cut"))).toMap
    // doc 1 repeats one vocabulary: every adjacent frame is identical → 0 cuts
    assert(rows(1L)._2 == 0L && rows(1L)._3 == -1L, s"coherent doc: ${rows(1L)}")
    // doc 2 flips vocabulary at the midpoint: exactly one disjoint boundary
    assert(rows(2L)._2 == 1L && rows(2L)._3 == 2L, s"shifting doc: ${rows(2L)}")
    // real corpus: some doc cuts, no doc cuts at every boundary
    val corpus = run("q_multimodal_scenecut").collect()
    assert(corpus.exists(_.getAs[Long]("n_cuts") > 0))
    assert(corpus.forall(r => r.getAs[Long]("n_cuts") < r.getAs[Long]("n_frames")))
  }
}
