package graft

import org.apache.spark.sql.functions._

import graft.ops.HnswIndex

/** Round-16 pins for incremental HNSW maintenance:
  *   1. recall@10 of the MAINTAINED index ≥ the from-scratch build's on
  *      the same corpus (the verdict's done-bar) — both read from the
  *      two oracle-checked recall queries' own Spark paths;
  *   2. index invariants the insert must preserve: every source's
  *      out-degree ≤ M_tot, and every inserted batch node has out-links
  *      (reachable / searchable);
  *   3. the maintained index differs from a from-scratch build only in
  *      HOW batch nodes found their neighbors — both must contain every
  *      batch node as a source.
  */
class Round16Spec extends SparkSpec {

  private def avgRecall(name: String): Double = {
    val df = SparkEntry.queries(name)(spark, sf)
    val rows = df.select(avg(col("recall"))).head()
    rows.getDouble(0)
  }

  test("incremental recall@10 >= from-scratch recall@10 (same corpus)") {
    val scratch = avgRecall("q_similarity_hnsw_recall")
    val inc = avgRecall("q_similarity_hnsw_incremental_recall")
    // The HARD invariant is the absolute bar. "incremental ≥ from-
    // scratch" is an empirical observation (insertion-by-search places
    // batch nodes with a sharper probe than one-shot LSH seeding), not
    // a structural guarantee — a new corpus or parameter tweak may
    // legitimately land the two within noise of each other, so it is
    // pinned only up to a small tolerance (round-16 ADVICE).
    info(s"recall@10: incremental $inc vs from-scratch $scratch")
    assert(inc >= scratch - 0.02,
      s"maintained index recall $inc more than 0.02 below from-scratch $scratch")
    assert(inc >= 0.90, s"maintained index recall $inc below the 0.90 bar")
  }

  test("sliding_windows generator: fused GenerateExec, no all-windows array") {
    graft.functions.SlidingWindows.register(spark)
    // q_text_chunks: the generate is in the final plan directly
    val chunksPlan = SparkEntry.queries("q_text_chunks")(spark, sf)
      .queryExecution.executedPlan.toString
    // q_dedup_substring: its rows frame is localCheckpoint'd (the plan
    // leaf hides the subtree), so pin the pre-checkpoint fragment the
    // query builds — same expression, same plan shape
    val subPlan = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), call_function("sliding_windows",
        split(col("text"), " "), lit(8), lit(1), lit(false)))
      .queryExecution.executedPlan.toString
    for ((q, plan) <- Seq("q_text_chunks" -> chunksPlan,
        "q_dedup_substring rows" -> subPlan)) {
      assert(plan.contains("slidingwindows") || plan.contains("sliding_windows")
          || plan.contains("SlidingWindows"),
        s"$q: no SlidingWindows generate in the plan:\n$plan")
      assert(plan.contains("Generate"), s"$q: no GenerateExec in the plan")
      // the composition it replaced built the full window array first
      assert(!plan.contains("transform(sequence"),
        s"$q: the all-windows transform(sequence…) projection is back")
    }
  }

  test("sliding_windows == posexplode∘transform composition, both modes") {
    import spark.implicits._
    graft.functions.SlidingWindows.register(spark)
    // docs spanning the edge cases: empty string, < size, == size,
    // size+1, long, exact stride boundary
    val docs = Seq("", "a", (1 to 7).map("w" + _).mkString(" "),
      (1 to 8).map("w" + _).mkString(" "), (1 to 9).map("w" + _).mkString(" "),
      (1 to 80).map("w" + _).mkString(" "), (1 to 56).map("w" + _).mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for ((sz, st, partial) <- Seq((8, 1, false), (32, 24, true), (5, 3, false),
        (5, 3, true))) {
      val ws = split(col("text"), " ")
      val got = docs.select(col("doc_id"),
          call_function("sliding_windows", ws, lit(sz), lit(st), lit(partial)))
        .toDF("doc_id", "pos", "win")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val nFull = when(size(ws) >= sz,
        floor((size(ws) - sz).cast("double") / st).cast("int") + 1).otherwise(0)
      val nPart = (floor((greatest(size(ws) - sz, lit(0)).cast("double")
        + (st - 1)) / st) + 1).cast("int")
      val n = if (partial) nPart else nFull
      // guard n == 0: sequence(0, -1) DESCENDS in Spark — the original
      // composition guarded with when(size >= W, …).otherwise(array())
      val exp = docs.select(col("doc_id"),
          posexplode(when(n > 0, transform(sequence(lit(0), n - 1),
              k => concat_ws(" ", slice(ws, k * st + 1, lit(sz)))))
            .otherwise(array().cast("array<string>"))))
        .toDF("doc_id", "pos", "win")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == exp, s"mode ($sz,$st,$partial): generator != composition")
    }
  }

  test("q_graph_components: labels are a fixpoint and roots label themselves") {
    import spark.implicits._
    val got = SparkEntry.queries("q_graph_components")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // component id never exceeds the node id (min-label propagation)
    assert(got.forall { case (n, c) => c <= n })
    // the root labels itself — labels are actual member nodes
    assert(got.forall { case (_, c) => got(c) == c })
    // fixpoint: one more neighbor-min round changes nothing (early exit
    // at the empty delta was exact, not truncation)
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("q"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select(col("p").cast("long").as("src"), col("q").cast("long").as("dst"))
      .collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val moved = edges.filter { case (u, v) => got(u) < got(v) }
    assert(moved.isEmpty, s"not a fixpoint: ${moved.take(3).toSeq}")
  }

  test("insert preserves degree cap and links every batch node") {
    graft.functions.CosineSimExpr.register(spark)
    val v = graft.queries.Round15Ops2.leveled(spark, sf)
      .localCheckpoint(eager = true)
    val base = v.filter(col("vec_id") % 10 =!= 0)
    val e0b = HnswIndex.buildE0(base)
    val batch = v.filter(col("vec_id") % 10 === 0).select("vec_id", "embedding")
    val (v2, e0, _, _) = HnswIndex.insert(base, e0b, batch)

    // merged vector set = the whole corpus
    assert(v2.count() == v.count())

    // degree cap: the re-cap must hold for EVERY source, old or new
    val mTot = graft.queries.Round15Ops2.MTot(0)
    val maxDeg = e0.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= mTot, s"out-degree $maxDeg exceeds M_tot $mTot")

    // every batch node got out-links (insertion search found a pool)
    val batchN = batch.count()
    val linked = e0.join(batch.select(col("vec_id").as("src")), "src")
      .select("src").distinct().count()
    assert(linked == batchN, s"only $linked of $batchN batch nodes linked")

    // and reverse links made them reachable FROM the standing corpus
    val reachable = e0.join(batch.select(col("vec_id").as("dst")), "dst")
      .select("dst").distinct().count()
    assert(reachable == batchN,
      s"only $reachable of $batchN batch nodes reachable from standing nodes")
  }
}
