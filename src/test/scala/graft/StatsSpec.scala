package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._

/** Mathematical contracts for the closed-form stats family — the
  * properties a hash gate can't express: OLS residual orthogonality,
  * chi-squared against an independent driver-side recomputation, and
  * Adamic-Adar against brute force on the collected incidence. */
class StatsSpec extends SparkSpec {

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

  test("q_stats_ols residuals are orthogonal to features (normal equations hold)") {
    val fit = SparkEntry.queries("q_stats_ols")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_discount", "l_tax").collect()
    fit.foreach { case (flag, (b1, b2, b0)) =>
      var sr, sr1, sr2 = 0.0; var n = 0
      rows.filter(_.getString(0) == flag).foreach { r =>
        val (y, x1, x2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        val resid = y - (b0 + b1 * x1 + b2 * x2)
        sr += resid; sr1 += resid * x1; sr2 += resid * x2; n += 1
      }
      // normal equations: X'r = 0 up to float accumulation noise,
      // scaled by row count (quantities are O(50))
      assert(math.abs(sr / n) < 1e-6, s"$flag: mean residual $sr")
      assert(math.abs(sr1 / n) < 1e-6, s"$flag: resid.x1 $sr1")
      assert(math.abs(sr2 / n) < 1e-6, s"$flag: resid.x2 $sr2")
    }
    // r2 in [0, 1] for an intercept model
    SparkEntry.queries("q_stats_ols")(spark, sf).collect().foreach { r =>
      val r2 = r.getDouble(5)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    }
  }

  test("q_stats_chisq matches a driver-side brute-force recomputation") {
    val row = SparkEntry.queries("q_stats_chisq")(spark, sf).collect().head
    val (n, nCells, dof, chi2) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val cells = Tables.events(spark, sf)
      .select(col("event_type"), expr("hour(ts) div 6").cast("long").as("tod"))
      .groupBy("event_type", "tod").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tot = cells.map(_._3).sum
    val brute = cells.sortBy(c => (c._1, c._2)).map { case (t, b, o) =>
      val e = rt(t).toDouble * ct(b).toDouble / tot.toDouble
      (o.toDouble - e) * (o.toDouble - e) / e
    }.foldLeft(0.0)(_ + _)
    assert(n == tot && nCells == cells.length)
    assert(dof == (rt.size - 1).toLong * (ct.size - 1).toLong)
    assert(math.abs(chi2 - brute) <= 1e-9 * math.max(1.0, brute),
      s"chi2 $chi2 vs brute $brute")
  }

  test("q_graph_linkpred matches brute-force Adamic-Adar; no cartesian product") {
    val top = SparkEntry.queries("q_graph_linkpred")(spark, sf)
    assert(collectAll(top.queryExecution.executedPlan) {
      case c: CartesianProductExec => c }.isEmpty, "wedge join must be keyed")
    val got = top.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val inc = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = inc.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case ((s1, s2), (nCommon, aa)) =>
      val shared = bySupp.collect {
        case (_, supps) if supps.contains(s1) && supps.contains(s2) => supps.size
      }.toSeq.filter(d => d >= 2 && d <= 32)
      assert(shared.size.toLong == nCommon, s"($s1,$s2) common ${shared.size}")
      // mirror the deg-bucketed fold: cnt·(1/ln d) added in deg order
      val brute = shared.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy(_._1)
        .foldLeft(0.0) { case (acc, (d, cnt)) =>
          acc + cnt.toDouble * (1.0 / math.log(d.toDouble)) }
      assert(math.abs(aa - brute) <= 1e-9, s"($s1,$s2) aa $aa vs $brute")
    }
  }
}
