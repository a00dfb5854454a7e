package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 16 (Holt linear trend, equi-depth
  * histogram). */
class Round11Spec18 extends SparkSpec {

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

  test("q_events_holt equals the driver-side Holt recursion") {
    val rows = run("q_events_holt").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("level"),
          r.getAs[Double]("trend"), r.getAs[Double]("forecast_next")))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).cast("double").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (tpe, buckets) =>
      val ys = buckets.sortBy(_._2).map(_._3)
      var l = ys.head; var b = 0.0
      ys.tail.foreach { y =>
        val nl = 0.5 * y + 0.5 * (l + b)
        val nb = 0.3 * ((0.5 * y + 0.5 * (l + b)) - l) + 0.7 * b
        l = nl; b = nb
      }
      val (n, gl, gb, gf) = rows(tpe)
      assert(n == ys.length, s"$tpe n_days")
      assert(math.abs(gl - l) < 1e-9 && math.abs(gb - b) < 1e-9, s"$tpe state")
      assert(math.abs(gf - (l + b)) < 1e-9, s"$tpe forecast")
    }
    assert(rows.size == daily.map(_._1).distinct.length)
  }

  test("q_stats_equidepth: buckets tile the table, depths within 1 of N/10, bounds ordered") {
    val rows = run("q_stats_equidepth").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))).sortBy(_._1)
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.map(_._1).toSeq == (0L to 9L))
    assert(rows.map(_._2).sum == n)
    // exact equi-depth: every bucket holds floor(N/10) or ceil(N/10)
    rows.foreach { case (b, c, _, _) =>
      assert(c == n / 10 || c == n / 10 + 1, s"bucket $b depth $c")
    }
    // bucket bound chains are monotone: hi_b <= lo_{b+1}
    rows.toSeq.sliding(2).foreach {
      case Seq((_, _, _, hi), (b2, _, lo2, _)) =>
        assert(hi <= lo2, s"bucket $b2 bound overlap $hi > $lo2")
      case _ =>
    }
  }

  test("q_stats_equidepth: no unpartitioned window over fact-sized input") {
    val df = run("q_stats_equidepth")
    df.collect()
    val bad = collectAll(df.queryExecution.executedPlan) {
      case w: WindowExec if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
