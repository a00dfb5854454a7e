package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Whole-surface physical-plan linter: compiles EVERY registered query's
  * plan and asserts the repo's scale house rules as a class, so a future
  * batch cannot silently reintroduce the anti-patterns individual pins
  * (PlanSpec, Round9cSpec, Round11Spec*) only guard query-by-query:
  *
  *   1. No CartesianProductExec and no BroadcastNestedLoopJoinExec whose
  *      build side is not provably tiny (scalar aggregate / small limit /
  *      small local relation) — unless the query is on the declared
  *      allowlist with a justification (q_join_cross is a deliberate
  *      cartesian; q_join_range is the documented BNLJ baseline the
  *      bucketed variant is pinned against).
  *   2. No unpartitioned WindowExec over a potentially fact-sized child.
  *      Auto-accepted shapes: a WindowGroupLimitExec below the window
  *      (rank-limit pushdown caps rows at k per partition) or a provably
  *      tiny child. Everything else must be allowlisted BY NAME with a
  *      justification, and even then the child subtree must contain an
  *      aggregation (the |shards|/span/vocab-bounded frames all do) —
  *      so the allowlist can never hide a raw global sort over a scan.
  *   3. No LocalTableScan wider than a model-state bound — a collected-
  *      and-reparallelized fact table shows up as a huge local relation.
  *
  * The canary test proves the linter actually catches the round-10 bug
  * class: a global row_number() over the documents scan (the original
  * q_layout_zorder shape) must be flagged.
  */
class PlanLintSpec extends SparkSpec {

  // ---- plan traversal -----------------------------------------------

  /** Collect across AQE stage boundaries and reused exchanges (PlanSpec
    * r11 lesson: stages are leaves; absence pins go vacuous without
    * descending), plus subquery plans. */
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      case q: QueryStageExec => collectAll(q.plan)(pf)
      case r: ReusedExchangeExec => collectAll(r.child)(pf)
    }.flatten
    val subs = p.subqueries.flatMap(collectAll(_)(pf))
    here ++ nested ++ subs
  }

  /** Row-bound proof: true when the subtree's ROOT provably produces at
    * most ~model-state rows regardless of input scale. Conservative —
    * GenerateExec (explode) can expand a tiny frame unboundedly and is
    * deliberately NOT tiny-preserving. */
  private def tiny(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => tiny(a.executedPlan)
    case q: QueryStageExec => tiny(q.plan)
    case r: ReusedExchangeExec => tiny(r.child)
    case agg: BaseAggregateExec if agg.groupingExpressions.isEmpty => true
    case l: LocalTableScanExec => l.rows.size <= 1000
    case g: GlobalLimitExec => g.limit <= 1000
    case c: CollectLimitExec => c.limit <= 1000
    case t: TakeOrderedAndProjectExec => t.limit <= 1000
    case r: RangeExec => r.numElements <= 1000
    case j: BaseJoinExec => tiny(j.left) && tiny(j.right)
    case u: UnionExec => u.children.forall(tiny)
    // Explicit whitelist of single-child nodes that cannot INCREASE row
    // count (round-12 ADVICE: a generic single-child fallthrough would
    // also accept expanding operators — GenerateExec/ExpandExec/
    // flatMap-style object operators — and silently weaken the
    // BNLJ/window guard). Grouped aggregation emits <= input rows, and
    // the groupless case is already unconditionally tiny above.
    case _: ProjectExec | _: FilterExec | _: SortExec | _: CoalesceExec |
         _: LocalLimitExec | _: BaseAggregateExec |
         _: org.apache.spark.sql.execution.exchange.Exchange |
         _: WholeStageCodegenExec | _: InputAdapter |
         _: WindowExec | _: WindowGroupLimitExec |
         _: SubqueryExec | _: SubqueryBroadcastExec =>
      tiny(p.children.head)
    case _ => false
  }

  /** The house prefix-sum pattern (ops/Sharded and its hand-rolled
    * twins): an unpartitioned window is acceptable when its child frame
    * is an aggregate grouped SOLELY on the shard column ("__shard" /
    * "shard") — the |shards|-row offsets frame whose cardinality
    * contract is documented at the helper. The naming convention is
    * deliberately load-bearing: a new query can only claim this shape
    * by adopting the helper (or its exact idiom), which is the review
    * point. */
  private def shardOffsetsFrame(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => shardOffsetsFrame(a.executedPlan)
    case q: QueryStageExec => shardOffsetsFrame(q.plan)
    case r: ReusedExchangeExec => shardOffsetsFrame(r.child)
    case agg: BaseAggregateExec =>
      agg.groupingExpressions.nonEmpty &&
        agg.groupingExpressions.flatMap(_.references.map(_.name))
          .forall(n => n == "__shard" || n == "shard")
    case _ if p.children.size == 1 => shardOffsetsFrame(p.children.head)
    case _ => false
  }

  // ---- house-rule allowlists (name -> justification) -----------------

  /** Queries allowed a cartesian / non-tiny BNLJ. Every entry names the
    * reason the build side is bounded (or the all-pairs is deliberate). */
  private val joinAllow: Map[String, String] = Map(
    "q_join_cross" -> "the deliberate cartesian demo (3-row sides)",
    "q_join_range" -> "documented BNLJ baseline; q_join_range_bucketed pins the equi-join rewrite against it",
    "q_dedup_embcos" -> "deliberate brute-force all-pairs exact baseline; the ANN family is the documented scale path",
    "q_dedup_lsh_eval" -> "exact ground truth affordable ONLY on the labeled doc_id<100 subset; the LSH side is the production pipeline unchanged",
    "q_similarity_topk" -> "broadcast <=5-row query-vector set (vec_id<5 filter); per-query brute-force scoring is the baseline design",
    "q_similarity_maxsim" -> "broadcast bounded query set fan-out (vec_id<k filter)",
    "q_similarity_recall_sweep" -> "broadcast bounded query set + ground-truth top-k lists",
    "q_similarity_rrf" -> "broadcast bounded query set fan-out",
    "q_similarity_hybrid" -> "broadcast bounded query set (vec_id<4 filter); brute-force both-channel scoring is the fusion baseline, the IVF/PQ family is the scale path",
    "q_similarity_rbo" -> "build side = 3-query aggregated top-10 rank lists",
    "q_similarity_ivf" -> "broadcast K=16 centroid table; the NxK nearest-centroid assignment IS the IVF design",
    "q_emb_hamming" -> "broadcast bounded query set fan-out (vec_id<k filter)",
    "q_emb_hardnegatives" -> "broadcast bounded query set fan-out (vec_id<k filter)",
    "q_emb_matryoshka" -> "4 rankings x the broadcast 5-query set (vec_id<5 filter)",
    "q_events_abtest" -> "build side = one variant of the 2-group rollup (<=1 row)",
    "q_emb_randproj" -> "all-pairs over the 40-vector labeled eval subset only (distortion calibration); the projection itself is map-only",
    "q_similarity_ndcg" -> "broadcast 3-query fan-out (the rbo/topk ranking shape)",
    "q_similarity_mrr_map" -> "broadcast 3-query fan-out (the rbo/topk ranking shape)",
    "q_stats_ttest" -> "build side = one segment of the 2-group rollup (<=1 row)",
    "q_stats_friedman" -> "gap-fill grid + stats fan-out: |days| x |event_types| aggregated frames and two <=k/1-row global rollups",
    "q_events_cusum" -> "build side = the 1-row (total, n_days) global rollup",
    "q_stats_mannkendall" -> "i<j pair frame over the calendar-bounded daily series (|days|^2, data-independent) + 1-row stat rollups",
    "q_stats_power" -> "build side = one variant of the 2-group rollup (<=1 row)",
    "q_stats_permtest" -> "build side = the 1-row observed-statistic rollup broadcast onto the 32-row permutation frame",
    "q_similarity_hnsw_recall" -> "broadcast 8-query fan-out for the EXACT brute-force ground truth the ANN result is graded against (the q_similarity_topk baseline shape)",
    "q_similarity_hnsw_incremental_recall" -> "broadcast 8-query fan-out for the EXACT brute-force ground truth the MAINTAINED index is graded against (same calibration shape as q_similarity_hnsw_recall)",
    "q_similarity_hnsw_delete_recall" -> "broadcast 8-query fan-out for the EXACT brute-force ground truth the REPAIRED index is graded against (same calibration shape as q_similarity_hnsw_recall)",
    "q_curation_submodular" -> "build sides = 1-row covered-total rollups onto 1-row argmax picks (k=3 greedy rounds)"
  )

  /** Queries allowed an unpartitioned WindowExec that is neither
    * rank-limited, provably tiny, nor the shard-offsets shape. Every
    * entry must still carry an aggregation below the window (asserted),
    * and names the domain bound of the windowed frame. */
  private val windowAllow: Map[String, String] = Map(
    "q_stats_chisq" -> "contingency frame: groupBy(event_type, tod) — |types| x 24 rows",
    "q_stats_cramersv" -> "contingency frame: groupBy(event_type, tod) — |types| x 24 rows",
    "q_stats_mannwhitney" -> "value histogram: groupBy(l_quantity) — quantity domain <= 50 rows",
    "q_stats_kruskal" -> "value histogram: groupBy(l_quantity) — quantity domain <= 50 rows (the mannwhitney machinery)",
    "q_stats_runs" -> "daily-count frame: groupBy(day) — calendar-bounded",
    "q_events_survival" -> "per-day death/censor life table: groupBy(t) — calendar-bounded",
    "q_mix_budget_waterfill" -> "per-source quota frame: groupBy(source) — |sources| rows",
    "q_text_unigram_train" -> "prune-rank over the piece-vocab frame: top-120 seed ∪ single chars, then EM-used pieces only — vocab-bounded by construction",
    "q_events_cusum" -> "CUSUM prefix sum + running min over the daily-count frame: groupBy(day) — calendar-bounded (the q_stats_runs shape)"
  )

  // ---- the lint -------------------------------------------------------

  private def lint(name: String, df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val out = scala.collection.mutable.ArrayBuffer[String]()

    val carts = collectAll(plan) { case c: CartesianProductExec => c }
    if (carts.nonEmpty && !joinAllow.contains(name))
      out += s"$name: CartesianProductExec (${carts.size}) outside allowlist"

    val bnljs = collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }
    val badBnlj = bnljs.filterNot { j =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      tiny(build)
    }
    if (badBnlj.nonEmpty && !joinAllow.contains(name))
      out += s"$name: BroadcastNestedLoopJoin with non-tiny build side (${badBnlj.size})"

    val unpart = collectAll(plan) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    val badWin = unpart.filterNot { w =>
      val limited = collectAll(w.child) { case g: WindowGroupLimitExec => g }.nonEmpty
      limited || tiny(w.child) || shardOffsetsFrame(w.child)
    }
    if (badWin.nonEmpty) {
      if (!windowAllow.contains(name))
        out += s"$name: unpartitioned WindowExec over non-tiny, non-rank-limited child (${badWin.size})"
      else {
        // even allowlisted: the child must be an aggregated frame
        val agged = badWin.forall(w =>
          collectAll(w.child) { case a: BaseAggregateExec => a }.nonEmpty)
        if (!agged)
          out += s"$name: allowlisted unpartitioned window has NO aggregation below it — raw global sort"
      }
    }

    val bigLocal = collectAll(plan) {
      case l: LocalTableScanExec if l.rows.size > 5000 => l.rows.size
    }
    if (bigLocal.nonEmpty)
      out += s"$name: LocalTableScan with ${bigLocal.max} rows — collected fact data?"

    out.toSeq
  }

  test("all registered queries satisfy the plan house rules") {
    // passthrough makes StageCache.stage a no-op, so the lint sees
    // INSIDE every staged substrate (minhash/graph/ALB/adjacency
    // frames) instead of stopping at a localCheckpoint RDD-scan leaf
    spark.conf.set("spark.graft.stageCache.passthrough", "true")
    try {
      val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try lint(name, fn(spark, sf))
          catch { case e: Throwable =>
            Seq(s"$name: plan compilation FAILED: ${e.getMessage}") }
      }
      assert(violations.isEmpty,
        s"\n${violations.size} plan-rule violations:\n  " + violations.mkString("\n  "))
    } finally spark.conf.unset("spark.graft.stageCache.passthrough")
  }

  test("canary: the linter catches the round-10 zorder bug (global row_number over a fact scan)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the exact round-10 anti-pattern: one-task global rank over the corpus
    val bad = docs.withColumn("zrank",
      row_number().over(Window.orderBy(col("doc_id"))))
    val v = lint("scratch_zorder_global", bad)
    assert(v.exists(_.contains("unpartitioned WindowExec")),
      s"linter failed to flag the global-window anti-pattern; got: $v")
  }

  test("canary: the window allowlist cannot hide a raw global sort") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bad = docs.withColumn("r",
      row_number().over(Window.orderBy(col("doc_id"))))
    // lint it UNDER AN ALLOWLISTED NAME: the sanity check (aggregation
    // required below an allowlisted unpartitioned window) must still fire
    val v = lint("q_stats_chisq", bad)
    assert(v.exists(_.contains("raw global sort")),
      s"allowlist sanity check failed to fire; got: $v")
  }

  test("canary: the linter catches a fact-fact cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bad = docs.select("doc_id").crossJoin(
      docs.select(org.apache.spark.sql.functions.col("doc_id").as("d2")))
    val v = lint("scratch_cartesian", bad)
    assert(v.exists(v0 => v0.contains("Cartesian") || v0.contains("NestedLoop")),
      s"linter failed to flag the fact-fact cartesian; got: $v")
  }
}
