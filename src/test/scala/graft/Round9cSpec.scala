package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.functions._

/** Plan + semantic pins for the second TPC-H batch and the corpus-stats
  * ops (covariance, PCA, winnowing, HTML extraction, mode). The hash
  * gate proves value equality; these pin the SCALE properties (which
  * joins broadcast, which filters push down, no all-pairs anywhere)
  * and the mathematical contracts (eigenpair residual, winnowing
  * density/coverage) that hashes can't express. */
class Round9cSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def planOf(name: String): SparkPlan =
    run(name).queryExecution.executedPlan

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

  // ---- plan pins -----------------------------------------------------

  test("q_tpch_forecast pushes all scan predicates and prunes to 4 columns") {
    val scan = collectAll(planOf("q_tpch_forecast")) {
      case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PushedFilters").contains("l_shipdate"),
      "shipdate range must reach the parquet scan")
    assert(scan.metadata("PushedFilters").contains("LessThan(l_quantity,24.0)"))
    val read = scan.metadata("ReadSchema")
    assert(!read.contains("l_returnflag") && !read.contains("l_tax"),
      s"unreferenced columns must prune: $read")
  }

  test("q_tpch_marketshare broadcasts every dimension leg") {
    // part-slice, ASIA customer set, supplier→nation: all explicitly
    // broadcast; only lineitem⋈orders may shuffle. No nested-loop or
    // cartesian anywhere in the 7-table join tree.
    val plan = planOf("q_tpch_marketshare")
    val bhj = collectAll(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 4, s"expected >=4 broadcast joins, got ${bhj.size}")
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    assert(collectAll(plan) { case j: CartesianProductExec => j }.isEmpty)
  }

  test("q_tpch_bigorders takes top-100 via TakeOrdered, not a global sort") {
    val top = collectAll(planOf("q_tpch_bigorders")) {
      case t: TakeOrderedAndProjectExec => t }
    assert(top.nonEmpty, "expected TakeOrderedAndProject for LIMIT 100")
  }

  test("q_tpch_mincost prunes the per-part argmin with WindowGroupLimit") {
    val wgl = collectAll(planOf("q_tpch_mincost")) {
      case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty,
      "rn=1 filter should push a rank-limit below the window sort")
  }

  test("q_emb_covariance aggregates map-side and broadcasts the dim stats") {
    val plan = planOf("q_emb_covariance")
    val partials = collectAll(plan) { case a: BaseAggregateExec => a }
      .filter(_.aggregateExpressions.exists(
        _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial))
    assert(partials.nonEmpty,
      "pair-product groupBy must partial-aggregate before its exchange")
    val bhj = collectAll(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, s"di/dj joins should broadcast, got ${bhj.size}")
  }

  test("q_text_winnowing selection is map-only: no hash shuffle, no re-hash per window") {
    val plan = planOf("q_text_winnowing")
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    assert(collectAll(plan) { case j: CartesianProductExec => j }.isEmpty)
    // the whole Winnow selection lives inside one row: the only
    // exchanges allowed are the deliberate scan rebalance (round-robin)
    // and the final doc_id sort (range) — never a hash aggregation
    val hashEx = collectAll(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashEx.isEmpty, s"selection must not shuffle, got ${hashEx.size}")
    // CollapseProject guard (Winnow.withSel scaladoc): the per-window
    // lambda must consume the PRECOMPUTED key array; if the optimizer
    // inlined the hash array into the lambda, the plan line holding
    // array_min would also hold md5 — an O(n²)-hashing plan
    val winLines = plan.toString.linesIterator
      .filter(_.contains("array_min")).toSeq
    assert(winLines.nonEmpty && winLines.forall(!_.contains("md5")),
      "per-window min must read the precomputed key array (O(n·w)), not inline md5 (O(n²))")
  }

  test("q_join_asof_nearest runs both direction frames over ONE sort") {
    // back/fwd candidates must share a single (user_id)-keyed
    // exchange+sort — a second sort would mean the two frames were
    // planned as separate window stages
    val wins = collectAll(planOf("q_join_asof_nearest")) {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        (w.partitionSpec.map(_.sql), w.orderSpec.map(_.sql))
    }
    assert(wins.nonEmpty && wins.distinct.size == 1,
      s"expected one shared (partition, order) spec, got $wins")
  }

  // ---- semantic pins -------------------------------------------------

  test("q_emb_pca_power returns a unit eigenvector with small residual") {
    val out = run("q_emb_pca_power").orderBy("dim").collect()
    val v = out.map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "loadings must be unit-norm")
    assert(lambda > 0, "dominant eigenvalue of a PSD covariance is positive")
    // residual ‖Cv − λv‖ / λ — power iteration after 30 steps should be
    // well-converged on a 64-dim covariance with a spectral gap
    val cov = SparkEntry.queries("q_emb_covariance")(spark, sf)
      .select("i", "j", "cov").collect()
    val dim = v.length
    val m = Array.ofDim[Double](dim, dim)
    cov.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      m(i)(j) = r.getDouble(2); m(j)(i) = r.getDouble(2)
    }
    val cv = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
    val resid = math.sqrt((0 until dim).map(i => {
      val e = cv(i) - lambda * v(i); e * e
    }).sum) / lambda
    // 30 fixed iterations, not convergence-tested: on the sf0.001
    // 100-vector corpus the spectral gap is narrow, so accept a few
    // percent of residual — the pin is "approximately the dominant
    // eigenpair", bit-exactness is the hash gate's job
    assert(resid < 0.05, s"eigenpair residual too large: $resid")
  }

  test("q_emb_covariance correlation is bounded and unit on the diagonal") {
    val rows = run("q_emb_covariance").collect()
    rows.foreach { r =>
      val i = r.getLong(0); val j = r.getLong(1)
      val cov = r.getDouble(2); val corr = r.getDouble(3)
      assert(math.abs(corr) <= 1.0 + 1e-12, s"|corr($i,$j)| > 1: $corr")
      if (i == j) {
        assert(cov >= 0, s"variance($i) negative: $cov")
        assert(math.abs(corr - 1.0) < 1e-12, s"corr($i,$i) != 1: $corr")
      }
    }
  }

  test("q_text_winnowing covers every doc at the expected density") {
    // Guarantee: any doc with >= w k-grams yields >= 1 fingerprint;
    // expected density is ~2/(w+1) = 0.4 of positions... per WINDOW
    // count the bound is: #fp <= #windows and #fp >= #windows/w.
    val w = 4; val k = 8
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (length(substring(col("text"), 1, 1024)) - k + 1).as("n"))
      .filter(col("n") >= w)
    val out = run("q_text_winnowing")
    assert(out.count() == docs.count(), "every eligible doc must appear")
    val joined = out.join(docs, "doc_id")
      .select(col("doc_id"), col("n_fp"),
        (col("n") - (w - 1)).cast("long").as("n_win"))
      .collect()
    joined.foreach { r =>
      val nFp = r.getLong(1); val nWin = r.getLong(2)
      assert(nFp >= 1 && nFp <= nWin,
        s"doc ${r.getLong(0)}: n_fp=$nFp outside [1, $nWin]")
      // each selected pos can serve at most w consecutive windows
      assert(nFp.toDouble >= nWin.toDouble / w,
        s"doc ${r.getLong(0)}: density ${nFp.toDouble / nWin} below 1/w")
    }
  }

  test("q_text_extract_html round-trips the document text") {
    // The constructed page embeds the raw text in <p>…</p>; extraction
    // must recover a whitespace-normalized superset containing it.
    val out = run("q_text_extract_html").limit(50).collect()
    out.foreach { r =>
      assert(r.getDouble(3) > 0.3 && r.getDouble(3) < 1.0,
        s"text ratio implausible: ${r.getDouble(3)}")
    }
    // no tags or script content survive
    val clean = run("q_text_extract_html")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val both = clean.join(docs, "doc_id").limit(20).collect()
    assert(both.nonEmpty)
  }

  test("q_agg_mode picks the true per-group maximum count") {
    val counts = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value")).cast("long").as("b"))
      .groupBy("event_type", "b").agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getString(0))
    run("q_agg_mode").collect().foreach { r =>
      val et = r.getString(0); val bucket = r.getLong(1); val cnt = r.getLong(2)
      val grp = counts(et).map(x => (x.getLong(1), x.getLong(2)))
      assert(grp.map(_._2).max == cnt, s"$et: $cnt is not the max count")
      val tied = grp.filter(_._2 == cnt).map(_._1).min
      assert(bucket == tied, s"$et: tie must break to smallest bucket")
    }
  }
}
