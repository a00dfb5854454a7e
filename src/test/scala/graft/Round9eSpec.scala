package graft

import org.apache.spark.sql.execution.{ExpandExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Contracts for the round-9 closing wave: the profiler's no-Expand
  * plan shape, the prefix join's 100%-recall-by-construction claim
  * (checked against driver-side brute force over ALL pairs), bootstrap
  * replicate structure, and stationary-distribution mass conservation. */
class Round9eSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

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

  test("q_quality_profile plans without an Expand (no 7x row duplication)") {
    val plan = run("q_quality_profile").queryExecution.executedPlan
    assert(collectAll(plan) { case e: ExpandExec => e }.isEmpty,
      "multi-countDistinct Expand would re-introduce the 13.5 s shape")
  }

  test("q_dedup_prefixjoin equals brute-force all-pairs (100% recall by construction)") {
    val got = run("q_dedup_prefixjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // driver-side exact ground truth over ALL pairs of 4-gram shingle sets
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .collect()
      .map { r =>
        val ws = r.getSeq[String](1)
        val sh = if (ws.length >= 4)
          (0 to ws.length - 4).map(i => ws.slice(i, i + 4).mkString("_")).toSet
        else Set.empty[String]
        r.getLong(0) -> sh
      }
    val want = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (d1, s1) = sets(i); (d2, s2) = sets(j)
      inter = (s1 & s2).size
      uni = s1.size + s2.size - inter
      if uni > 0 && 5 * inter >= 4 * uni
    } yield (math.min(d1, d2), math.max(d1, d2))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("q_stats_bootstrap CI brackets the exact mean; replicates well-formed") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    run("q_stats_bootstrap").collect().foreach { r =>
      val (flag, lo, hi) = (r.getString(0), r.getDouble(3), r.getDouble(4))
      val m = exact(flag)
      assert(lo < hi && lo > 0)
      assert(m > lo && m < hi,
        s"$flag: exact mean $m outside bootstrap CI [$lo, $hi]")
    }
  }

  test("q_events_stationary conserves mass up to floor leakage") {
    val masses = run("q_events_stationary").collect().map(_.getLong(1))
    val total = masses.sum
    // starts at <= 1e6 (uniform floor) and each round's integral
    // division only sheds mass — never creates it
    assert(total <= 1000000L, s"mass created: $total")
    assert(total >= 900000L, s"excessive floor leakage: $total")
    assert(masses.forall(_ > 0), "every recurrent state keeps mass")
  }
}
