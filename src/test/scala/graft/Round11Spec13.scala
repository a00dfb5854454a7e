package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Plan pins for the round-11 batch 5–11 additions: the scale
  * properties their SCALING.md entries claim, asserted on the actual
  * physical plans. */
class Round11Spec13 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

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

  private def executedPlanOf(name: String): SparkPlan = {
    val df = run(name)
    df.collect() // force execution so AQE finalizes the plan
    df.queryExecution.executedPlan
  }

  private def assertNoGlobalFactWindow(name: String): Unit = {
    val bad = collectAll(executedPlanOf(name)) {
      case w: WindowExec if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
    }
    assert(bad.isEmpty,
      s"$name has an unpartitioned window over non-aggregated input:\n" +
        bad.map(_.toString).mkString("\n"))
  }

  test("q_sample_systematic: sharded rank — no unpartitioned window over the corpus") {
    assertNoGlobalFactWindow("q_sample_systematic")
  }

  test("q_stats_mannwhitney: rank windows sit above the histogram aggregate") {
    assertNoGlobalFactWindow("q_stats_mannwhitney")
  }

  test("q_events_survival: prefix sums sit above the day aggregate") {
    assertNoGlobalFactWindow("q_events_survival")
  }

  test("q_stats_theilsen: pair generation is in-row above the month aggregate") {
    assertNoGlobalFactWindow("q_stats_theilsen")
  }

  test("q_join_bloom_pruned: pruned scan reads only the referenced lineitem columns; supplier joins by broadcast") {
    val plan = executedPlanOf("q_join_bloom_pruned")
    val liScans = collectAll(plan) { case s: FileSourceScanExec
      if s.metadata("Location").contains("lineitem") => s }
    assert(liScans.nonEmpty)
    liScans.foreach { s =>
      val schema = s.metadata("ReadSchema")
      assert(!schema.contains("l_shipdate") && !schema.contains("l_quantity"),
        s"bloom-pruned scan reads unreferenced columns: $schema")
    }
    assert(collectAll(plan) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "supplier dim should broadcast")
  }

  test("q_emb_hardnegatives and q_similarity_rrf rank-limit via WindowGroupLimit") {
    Seq("q_emb_hardnegatives", "q_similarity_rrf").foreach { q =>
      val wgl = collectAll(executedPlanOf(q)) { case w: WindowGroupLimitExec => w }
      assert(wgl.nonEmpty, s"$q: expected WindowGroupLimit rank pushdown")
    }
  }

  test("q_quality_gopher is window-free: rules fold into one combinable aggregate") {
    val w = collectAll(executedPlanOf("q_quality_gopher")) { case w: WindowExec => w }
    assert(w.isEmpty, "gopher battery should plan no windows at all")
  }
}
