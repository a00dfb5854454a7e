package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-11 pins: the sharded-rank rewrite (ops/Sharded) of the two
  * data-layout queries and the Pareto/Gini rank must leave NO
  * unpartitioned window over fact-sized input — the only global-order
  * window allowed is the |shards|-row prefix-sum, which necessarily
  * sits ABOVE an aggregate (shard counts). Plus the Winnow text-cap
  * invariant (fails loudly past pos 2047) and the suffix-LCP
  * end-of-suffix freeze (equal short suffixes report their TRUE
  * length, not the 64 cap).
  */
class Round11Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Collect across ALL plan layers: AQE wrappers, materialized query
    * stages (QueryStageExec is a LEAF — `collect` alone never sees the
    * stage's subtree), and reused exchanges. Without the stage
    * recursion an absence pin ("no unpartitioned window") is vacuously
    * green once AQE wraps the interesting operator in a stage. */
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      case q: QueryStageExec => collectAll(q.plan)(pf)
      case r: ReusedExchangeExec => collectAll(r.child)(pf)
    }.flatten
    here ++ nested
  }

  private def hasAggBelow(p: SparkPlan): Boolean =
    collectAll(p) {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case a: SortAggregateExec => a
    }.nonEmpty

  /** Every unpartitioned WindowExec must consume a post-aggregate
    * (shard-granular) frame — i.e. an aggregate below it in the plan —
    * never the fact table itself. */
  private def assertNoGlobalFactWindow(name: String): Unit = {
    val df = run(name)
    df.collect() // force execution so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val bad = collectAll(plan) {
      case w: WindowExec if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
    }
    assert(bad.isEmpty,
      s"$name has an unpartitioned window over non-aggregated (fact-sized) input:\n" +
        bad.map(_.toString).mkString("\n"))
  }

  test("q_layout_zorder: no unpartitioned window over fact-sized input") {
    assertNoGlobalFactWindow("q_layout_zorder")
  }

  test("q_layout_hilbert: no unpartitioned window over fact-sized input") {
    assertNoGlobalFactWindow("q_layout_hilbert")
  }

  test("q_agg_pareto: no unpartitioned window over fact-sized input") {
    assertNoGlobalFactWindow("q_agg_pareto")
  }

  test("q_stats_ks: no unpartitioned window over fact-sized input") {
    assertNoGlobalFactWindow("q_stats_ks")
  }

  test("Sharded.globalRowNumber equals the global row_number it replaces") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .withColumn("shard", col("l_partkey") % 7)
    val expect = df.withColumn("rn", row_number().over(
      Window.orderBy("shard", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")))
    val got = graft.ops.Sharded.globalRowNumber(df, col("shard"),
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey")), "rn")
    assert(got.select("rn").except(expect.select("rn")).isEmpty &&
      got.count() == expect.count())
    val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "rn")
    assert(got.select(key.map(col): _*).except(expect.select(key.map(col): _*)).isEmpty)
  }

  test("Winnow.withSel fails loudly when the text cap invariant is violated") {
    import spark.implicits._
    import graft.functions.Winnow
    val ok = Seq((1L, "a" * 100)).toDF("doc_id", "txt")
      .withColumn("n", length(col("txt")) - lit(Winnow.K - 1))
    assert(Winnow.withSel(ok).collect().length == 1)
    val bad = Seq((1L, "a" * 3000)).toDF("doc_id", "txt")
      .withColumn("n", length(col("txt")) - lit(Winnow.K - 1))
    val e = intercept[Exception] {
      Winnow.withSel(bad).collect()
    }
    assert(e.getMessage.contains("2047") ||
      Option(e.getCause).exists(_.getMessage.contains("2047")))
  }

  test("q_tpch_partsupp (Q16) plans NOT IN as a broadcast NAAJ, never a nested loop") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    // sf0.01: the NOT IN build side must be NON-empty — at sf0.001 no
    // supplier has a negative balance and AQE's PropagateEmptyRelation
    // (correctly) erases the anti join from the final plan
    val df = SparkEntry.queries("q_tpch_partsupp")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty &&
      collectAll(plan) { case j: CartesianProductExec => j }.isEmpty,
      "NOT IN must not fall back to a nested loop / cartesian")
    assert(collectAll(plan) {
      case j: BroadcastHashJoinExec if j.isNullAwareAntiJoin => j
    }.nonEmpty, "expected a null-aware anti (broadcast hash) join for NOT IN")
  }

  test("TPC-H Q4/Q11/Q20 shapes: semi joins and broadcasts, no nested loops") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    for (name <- Seq("q_tpch_orderpriority", "q_tpch_stockvalue", "q_tpch_promoparts")) {
      val df = run(name)
      assert(df.collect().nonEmpty, s"$name must be non-empty at sf0.001")
      val plan = df.queryExecution.executedPlan
      // Q11's 1-row scalar-threshold crossJoin legitimately plans as a
      // broadcast nested loop — but ONLY with a post-aggregate (single
      // row) build side; everything else must stay loop-free
      collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          case _ => j.left
        }
        assert(name == "q_tpch_stockvalue" && hasAggBelow(build),
          s"$name has a non-scalar nested-loop join")
      }
      assert(collectAll(plan) { case j: CartesianProductExec => j }.isEmpty,
        s"$name has a cartesian product")
      val semis = collectAll(plan) {
        case j: org.apache.spark.sql.execution.joins.HashJoin
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      if (name != "q_tpch_stockvalue")
        assert(semis.nonEmpty, s"$name: EXISTS/IN must compile to a semi join")
    }
  }

  test("StageCache: cached and uncached minhash family results are identical") {
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sf)
    val plain = Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9)
      .orderBy("d1", "d2").collect().toSeq
    val plainCluster = Dedup.dedupClusters(docs, "doc_id", "text", 16, 4, 0.9)
      .orderBy("doc_id").collect().toSeq
    val dir = Files.createTempDirectory("graft_stage_spec").toString
    spark.conf.set("spark.graft.stageCache.dir", dir)
    try {
      val cached = Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9)
        .orderBy("d1", "d2").collect().toSeq
      // second consumer: must hit the cache (files exist) and agree
      val cachedCluster = Dedup.dedupClusters(docs, "doc_id", "text", 16, 4, 0.9)
        .orderBy("doc_id").collect().toSeq
      assert(cached == plain, "stage-cached pairs diverged")
      assert(cachedCluster == plainCluster, "stage-cached clusters diverged")
      assert(new java.io.File(dir).listFiles().nonEmpty, "cache wrote nothing")
    } finally spark.conf.set("spark.graft.stageCache.dir", "")
  }

  test("q_dedup_suffixlcp reports TRUE lcp for equal short (tail) suffixes") {
    // two identical 40-char docs: every sampled suffix pair is equal and
    // SHORTER than the 64-char key — the pre-fix fold matched '' = ''
    // past the end and reported 64; the frozen fold reports the true
    // suffix length, max 40 (the pos-1 suffix)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lcp").toString
    val txt = ("abcd" * 10) // 40 chars, shard prefix "abcd" shared
    Seq((1L, txt, "en", "web", 40L), (2L, txt, "en", "web", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_dedup_suffixlcp")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("max_lcp")).toMap
    // suffixes at pos 1,5,9 (len 40,36,32); the lexicographic order
    // interleaves docs, so the cross-doc predecessor pairs carry true
    // lengths <= 40 — never the 64 cap
    assert(rows.values.max <= 40L, s"lcp must freeze at suffix end: $rows")
    assert(rows.values.max == 40L, s"equal pos-1 suffixes must score 40: $rows")
  }
}
