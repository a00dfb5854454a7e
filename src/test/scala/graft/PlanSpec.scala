package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan regression guards: the scale properties SCALING.md claims
  * (broadcasts, pushdown, rank-limit pushdown, equi-join band joins) are
  * asserted on the actual plans so a refactor can't silently lose them. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      // query stages are LEAVES — without these two cases an absence
      // pin is vacuously green once AQE materializes a stage (r11 fix)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectAll(q.plan)(pf)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        collectAll(r.child)(pf)
    }.flatten
    here ++ nested
  }

  test("q_join_broadcast plans all three dimension joins as broadcast hash joins") {
    val bhj = collectAll(planOf("q_join_broadcast")) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size == 3, s"expected 3 broadcast hash joins, got ${bhj.size}")
  }

  test("q_filter pushes predicates into the parquet scan and prunes columns") {
    val scan = collectAll(planOf("q_filter")) { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_quantity,45.0)"))
    assert(!scan.metadata("ReadSchema").contains("l_tax"),
      "projection should prune unreferenced columns")
  }

  test("q_topk uses rank-limit pushdown (WindowGroupLimit), not a global sort") {
    val wgl = collectAll(planOf("q_topk")) { case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, "expected WindowGroupLimit in the top-k plan")
  }

  test("q_join_range_bucketed is an equi-join; raw q_join_range is the BNLJ baseline") {
    val bucketed = planOf("q_join_range_bucketed")
    assert(collectAll(bucketed) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "bucketed band join must not plan a nested-loop join")
    val raw = planOf("q_join_range")
    assert(collectAll(raw) { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty)
  }

  test("q_similarity_topk broadcasts the query vectors") {
    val b = collectAll(planOf("q_similarity_topk")) { case e: BroadcastExchangeExec => e }
    assert(b.nonEmpty, "query-vector side should be a broadcast exchange")
  }

  test("q_upsert_latest compacts via partial aggregation, not a window sort") {
    // The scale claim: map-side combine shrinks the shuffle to one row
    // per (mapper, key). A refactor to row_number().over(window) would
    // shuffle and sort every event — catch it here.
    val plan = planOf("q_upsert_latest")
    val aggs = collectAll(plan) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      "expected a Partial-mode aggregate before the exchange")
    val windows = collectAll(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "latest-state compaction must not use a window")
  }

  test("native as-of join plans exactly one co-partitioning exchange per side") {
    val plan = planOf("q_join_asof_native")
    val asof = collectAll(plan) { case a: graft.plans.AsOfJoinExec => a }
    assert(asof.nonEmpty, "expected AsOfJoinExec")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // exchanges under the asof node: one per child (plus the final global
    // orderBy exchange elsewhere in the plan)
    val under = asof.head.children.flatMap(c =>
      collectAll(c) { case e: ShuffleExchangeExec => e })
    assert(under.size <= 3,
      s"as-of children should need at most key-partitioning (+1 for the " +
        s"clicks dedup agg), got ${under.size} exchanges")
  }

  test("q_join_interval dedups via the first-shared-bucket predicate, not a full-row distinct") {
    // Bucket fanout used to be collapsed with distinct() over all output
    // columns — a wide-row shuffle at scale that also merged legitimately
    // duplicate input rows. The fix keeps each pair's first shared bucket
    // only, so no aggregate may sit above the bucket join.
    val plan = planOf("q_join_interval")
    val aggs = collectAll(plan) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        if a.groupingExpressions.size > 3 => a } // full-row distinct = group by every column
    assert(aggs.isEmpty,
      s"interval join must not dedup with a wide groupBy/distinct: $aggs")
  }

  test("q_dedup_minhash_capped plans the bucket cap as WindowGroupLimit") {
    // The scaladoc's skew claim: row_number ≤ K runs as partial top-K per
    // mapper BEFORE the shuffle, so a mega-bucket never sorts in one task.
    val wgl = collectAll(planOf("q_dedup_minhash_capped")) {
      case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, "expected WindowGroupLimit for the bucket cap")
  }

  test("minhash pair pipeline carries no mandatory broadcast hint") {
    // The distinct word-set table grows with the corpus: a hard broadcast()
    // hint would OOM at scale. SHUFFLE_HASH hints are fine (shuffled joins
    // scale out); what must never reappear is a forced broadcast.
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    val analyzed = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .queryExecution.analyzed
    val bcast = analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
    }
    assert(bcast.isEmpty, s"expected no broadcast hints, found: $bcast")
  }

  test("TPC-H pack: pushdown, pruning, broadcasts, and top-k without a global sort") {
    // Q1 shape: shipdate predicate reaches the parquet scan; unreferenced
    // money columns are pruned
    val pricing = collectAll(planOf("q_tpch_pricing")) {
      case s: FileSourceScanExec => s }.head
    assert(pricing.metadata("PushedFilters").contains("l_shipdate"),
      s"expected shipdate pushdown, got ${pricing.metadata("PushedFilters")}")
    assert(!pricing.metadata("ReadSchema").contains("l_suppkey"),
      "Q1 must prune join keys it never touches")
    // Q3 shape: the top-10 runs as TakeOrderedAndProject, never a global sort
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val ship = planOf("q_tpch_shipping")
    assert(collectAll(ship) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "expected TakeOrderedAndProject for LIMIT 10")
    // Q5 shape: the 25-row nation×region dimension rides a broadcast, and
    // the six-table join contains no cartesian product
    val local = planOf("q_tpch_localsupp")
    assert(collectAll(local) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "expected the nation dimension broadcast")
    assert(collectAll(local) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty &&
      collectAll(local) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.isEmpty,
      "six-table star join must stay equi-join only")
  }

  test("q_mix_materialize joins the factor table by broadcast, never sort-merge") {
    // The epoch explode's scale claim: the per-source factor table rides a
    // broadcast so the corpus itself is never shuffled. (The 1-row totals
    // cross join legitimately plans as a nested-loop.)
    val plan = planOf("q_mix_materialize")
    assert(collectAll(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "expected the factor table on a broadcast hash join")
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    assert(collectAll(plan) { case j: SortMergeJoinExec => j }.isEmpty,
      "corpus must not shuffle for a sort-merge join")
  }

  test("q_scrub_boilerplate prunes via a digest-keyed anti join") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val anti = collectAll(planOf("q_scrub_boilerplate")) {
      case j: BaseJoinExec if j.joinType == LeftAnti => j }
    assert(anti.nonEmpty, "expected a left-anti join against the boilerplate set")
    // keys must be the 8-byte digests, not paragraph text
    assert(anti.head.leftKeys.forall(_.dataType ==
      org.apache.spark.sql.types.LongType),
      s"anti join must key on xxhash64 digests, got ${anti.head.leftKeys}")
  }

  test("q_dedup_substring semi-joins on 8-byte window digests") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val semi = collectAll(planOf("q_dedup_substring")) {
      case j: BaseJoinExec if j.joinType == LeftSemi => j }
    assert(semi.nonEmpty, "expected a left-semi join against the cross-doc set")
    assert(semi.head.leftKeys.forall(_.dataType ==
      org.apache.spark.sql.types.LongType),
      s"semi join must key on xxhash64 digests, got ${semi.head.leftKeys}")
  }

  test("q_dedup_substring_spans keeps the digest semi join and adds one islands sort") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = planOf("q_dedup_substring_spans")
    val semi = collectAll(plan) {
      case j: BaseJoinExec if j.joinType == LeftSemi => j }
    assert(semi.nonEmpty, "expected the cross-doc semi join")
    assert(semi.head.leftKeys.forall(_.dataType ==
      org.apache.spark.sql.types.LongType),
      s"semi join must key on xxhash64 digests, got ${semi.head.leftKeys}")
    // both window functions (running covered-end max + island counter)
    // must share ONE (doc_id, pos) sort — assert the shared-sort property
    // itself: exactly one SortExec orders on (doc_id, pos). (Counting
    // WindowExec nodes can't catch the regression: one sort per function
    // still yields 2 window nodes.)
    import org.apache.spark.sql.execution.SortExec
    val islandSorts = collectAll(plan) {
      case srt: SortExec if {
        val keys = srt.sortOrder.map(_.child.toString.toLowerCase)
        keys.exists(_.contains("doc_id")) && keys.exists(_.contains("pos"))
      } => srt
    }
    assert(islandSorts.size == 1,
      s"the islands windows must share ONE (doc_id, pos) sort, got ${islandSorts.size}")
  }

  test("q_dedup_semantic rank-limits the anchor set via WindowGroupLimit") {
    // The capped-SemDeDup scale claim: per cluster only the semCap
    // smallest-id members survive into the comparison join's left side,
    // planned as a rank-limit pushdown (WindowGroupLimit) — not a full
    // window materialization followed by a filter.
    val wgl = collectAll(planOf("q_dedup_semantic")) {
      case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, "expected WindowGroupLimit for the anchor cap")
  }

  test("q_dedup_incremental bloom-prunes the standing corpus before its shuffle") {
    // The batch-keyed sketch must sit on the corpus side as a Filter
    // BELOW the distinct()'s exchange — pruning after the shuffle would
    // move the bytes it exists to delete. FilterExec's condition renders
    // the expression as might_contain(scalar-subquery#...).
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = planOf("q_dedup_incremental")
    val bloomFilters = collectAll(plan) {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f }
    assert(bloomFilters.nonEmpty, "expected a might_contain bloom prefilter")
    // below-the-exchange check: some exchange in the plan has the bloom
    // filter inside its subtree
    val underExchange = collectAll(plan) { case e: ShuffleExchangeExec => e }
      .exists(e => collectAll(e) {
        case f: FilterExec if f.condition.toString.contains("might_contain") => f
      }.nonEmpty)
    assert(underExchange, "bloom prefilter must run before the corpus shuffle")
  }

  test("q_index_postings shares one per-term sort between stats and ranking windows") {
    // The one-scan design: df/total_tf (unbounded-frame windows) and the
    // top-B row_number ranking both run under a single repartition-by-term
    // sort. Two sorts (one per window spec) would double the dominant
    // shuffle's downstream cost.
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = planOf("q_index_postings")
    val windows = collectAll(plan) { case w: WindowExec => w }
    assert(windows.size == 2, s"expected stats + ranking windows, got ${windows.size}")
    val termSorts = collectAll(plan) {
      case srt: SortExec
        if srt.sortOrder.exists(_.child.toString.toLowerCase.contains("term")) &&
          collectAll(srt) { case w: WindowExec => w }.isEmpty => srt
    }
    // exactly one term-keyed sort feeds the window pair (the final
    // ORDER BY term sort sits ABOVE them and contains them in its subtree)
    assert(termSorts.size == 1,
      s"both windows must share ONE per-term sort, got ${termSorts.size}")
  }

  test("q_text_bm25 hints broadcasts only on bounded model state") {
    // Query terms, their df rows, and the one-row stats frame carry the
    // broadcast() hints; nothing doc-granular (tf, dl — both grow with the
    // corpus) may be FORCED to broadcast. (At tiny SF the planner may
    // still adaptively broadcast dl from size estimates — that choice
    // reverses itself at scale; a hint would not.)
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    val analyzed = SparkEntry.queries("q_text_bm25")(spark, sf)
      .queryExecution.analyzed
    val bcast = analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
    }
    assert(bcast.nonEmpty, "expected broadcast hints on the bounded model state")
    val docGranular = bcast.filter(_.output.exists(a =>
      a.name == "doc_id" || a.name == "dl" || a.name == "tf"))
    assert(docGranular.isEmpty,
      s"no doc-granular frame may carry a broadcast hint: $docGranular")
  }

  test("q_text_tfidf_skewsafe routes the vocab head by broadcast, the tail by shuffle") {
    // The Zipf-skew split: hot words must bypass the shuffle via a
    // broadcast of the df head; the tail join must stay a shuffled hash
    // join (per-key volume bounded by construction). A plain single
    // shuffle-by-word join would send a hot word's every occurrence to
    // one reducer.
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    val plan = planOf("q_text_tfidf_skewsafe")
    val wordBhj = collectAll(plan) {
      case j: BroadcastHashJoinExec
        if j.leftKeys.exists(_.toString.toLowerCase.contains("word")) => j }
    assert(wordBhj.nonEmpty, "expected the df head to join by broadcast")
    val wordShj = collectAll(plan) {
      case j: ShuffledHashJoinExec
        if j.leftKeys.exists(_.toString.toLowerCase.contains("word")) => j }
    assert(wordShj.nonEmpty, "expected the df tail to join by shuffle")
  }

  test("q_dedup_editdist never broadcasts the raw documents scan") {
    // The scale claim: text fetches stream the corpus scan against
    // broadcast candidate slivers. A broadcast whose subtree is a bare
    // parquet scan (no join below it) would be the corpus itself — the
    // shape AQE picks at demo scale if the join direction is left to
    // stats, and exactly what dies at 100 TB.
    val plan = planOf("q_dedup_editdist")
    val rawScanBcast = collectAll(plan) { case b: BroadcastExchangeExec => b }
      .filter { b =>
        val scans = collectAll(b.child) { case s: FileSourceScanExec => s }
        val joins = collectAll(b.child) { case j: BroadcastHashJoinExec => j }
        scans.nonEmpty && joins.isEmpty
      }
    assert(rawScanBcast.isEmpty,
      "a broadcast exchange carries the bare documents scan")
    val bhj = collectAll(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, "both text fetches should be broadcast joins")
  }

  test("q_text_collocations joins counts to counts by broadcast; no sort-merge") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = planOf("q_text_collocations")
    assert(collectAll(plan) { case j: BroadcastHashJoinExec => j }.size >= 2,
      "unigram counts should attach by broadcast")
    assert(collectAll(plan) { case j: SortMergeJoinExec => j }.isEmpty,
      "nothing in the PMI join tree is big enough to sort-merge")
  }

  test("q_filter_outliers shares one cid shuffle between its rank and count windows") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = planOf("q_filter_outliers")
    assert(collectAll(plan) { case w: WindowExec => w }.size == 2)
    val hashShuffles = collectAll(plan) { case e: ShuffleExchangeExec => e }
      .filter(_.outputPartitioning.toString.contains("hashpartitioning"))
    assert(hashShuffles.size == 1,
      s"rank and count windows must share ONE cid shuffle, got ${hashShuffles.size}")
  }

  test("q_sql_correlated decorrelates to an aggregate + equi-join, no nested loop") {
    // Catalyst must rewrite the correlated scalar subquery into a
    // per-custkey aggregate joined back on the correlation key; a
    // nested-loop (per-row subquery) shape would be quadratic.
    val plan = planOf("q_sql_correlated")
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "correlated scalar subquery must not plan a nested-loop join")
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    assert(collectAll(plan) { case a: BaseAggregateExec => a }.nonEmpty,
      "expected the decorrelated per-customer aggregate")
  }

  test("q_sample_weighted rank-limits each stratum via WindowGroupLimit") {
    // The 100 TB claim: per-stratum selection keeps ≤ k rows per map task
    // before the exchange — the WindowGroupLimit pushdown, not a full
    // per-stratum sort + filter.
    val wgl = collectAll(planOf("q_sample_weighted")) {
      case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, "expected WindowGroupLimit for the per-stratum top-k")
  }

  test("q_emb_quantize is map-only: no hash shuffle anywhere") {
    // The quantization rewrite is a pure projection; the only exchange
    // allowed is the final presentation sort's range partitioning.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val hashShuffles = collectAll(planOf("q_emb_quantize")) {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e }
    assert(hashShuffles.isEmpty,
      s"quantization must not shuffle, got ${hashShuffles.size} hash exchanges")
  }

  test("q_graph_triangles intersects broadcast adjacency arrays; edges never shuffle into a wedge join") {
    // The round-9 rewrite's contract: both adjacency attachments are
    // broadcast hash joins, and no sort-merge join (the old wedge
    // self-join shape) remains in the plan. Passthrough (the
    // PlanLintSpec mechanism) since r17: the shared staged triangle
    // enumeration (GraphOps.orientedTriangles) otherwise hides the
    // adjacency joins behind a checkpoint leaf in gate mode.
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    spark.conf.set("spark.graft.stageCache.passthrough", "true")
    try {
      val plan = planOf("q_graph_triangles")
      val smjOnNodes = collectAll(plan) { case j: SortMergeJoinExec => j }
        .filter(_.leftKeys.exists(_.toString.contains("src")))
      assert(smjOnNodes.isEmpty, "wedge-style sort-merge join crept back in")
      assert(collectAll(plan) { case j: BroadcastHashJoinExec => j }.size >= 2,
        "both adjacency lookups should be broadcast hash joins")
    } finally spark.conf.unset("spark.graft.stageCache.passthrough")
  }

  test("q_text_bpe_train picks each merge via TakeOrdered, never a global sort") {
    // The scale claim: the per-round argmax is TakeOrdered(1) over the
    // vocab-bounded pair frame. A refactor to orderBy().limit() that
    // loses the fusion would plan a full SortExec over the pair counts.
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val top = collectAll(planOf("q_text_bpe_train")) {
      case t: TakeOrderedAndProjectExec => t
    }
    assert(top.size >= 3, s"expected one TakeOrdered per merge round, got ${top.size}")
  }

  test("q_basket_pairs attaches part counts by broadcast and takes top-20 as TakeOrdered") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val plan = planOf("q_basket_pairs")
    assert(collectAll(plan) { case j: BroadcastHashJoinExec => j }.size >= 2,
      "both part-count attachments should be broadcast hash joins")
    assert(collectAll(plan) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-20 should plan as TakeOrdered, not sort+limit")
  }

  test("q_merge_cdc applies the changelog through exactly one full-outer join") {
    import org.apache.spark.sql.catalyst.plans.FullOuter
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = planOf("q_merge_cdc")
    val fullOuter = collectAll(plan) {
      case j: SortMergeJoinExec if j.joinType == FullOuter => j
      case j: ShuffledHashJoinExec if j.joinType == FullOuter => j
    }
    assert(fullOuter.size == 1, s"expected one full-outer merge join, got ${fullOuter.size}")
    // compaction must stay a partial aggregate, never a row_number window
    assert(collectAll(plan) { case w: WindowExec => w }.isEmpty,
      "changelog compaction regressed to a window sort")
  }

  test("q_quality_constraints checks referential integrity via one semi join") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.joins.{BaseJoinExec}
    val semis = collectAll(planOf("q_quality_constraints")) {
      case j: BaseJoinExec if j.joinType == LeftSemi => j
    }
    assert(semis.size == 1, s"expected exactly one left-semi FK probe, got ${semis.size}")
  }
}
