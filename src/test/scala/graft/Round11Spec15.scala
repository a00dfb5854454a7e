package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 13 (ROC-AUC, calibration/ECE):
  * brute-force equality, planted-signal discrimination, the
  * Sharded.globalPrefixSum decomposition, and the no-global-fact-window
  * plan pin on the AUC rank path.
  */
class Round11Spec15 extends SparkSpec {

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

  test("q_stats_auc equals brute-force pairwise AUC; planted class discriminates") {
    val rows = run("q_stats_auc").collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("npos"), r.getAs[Long]("nneg"), r.getAs[Double]("auc"))))
      .toMap
    // brute force: for each class, count (pos, neg) pairs won + half-ties
    val data = Tables.embeddings(spark, sf)
      .select(
        (element_at(col("embedding"), 2).cast("double")
          + when(col("label") === 0, lit(0.05)).otherwise(lit(0.0))).as("sc"),
        col("label").cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    rows.keys.toSeq.sorted.foreach { c =>
      val pos = data.filter(_._2 == c).map(_._1)
      val neg = data.filter(_._2 != c).map(_._1)
      var won = 0.0
      for (p <- pos; n <- neg)
        won += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      val brute = won / (pos.length.toDouble * neg.length.toDouble)
      val (np, nn, auc) = rows(c)
      assert(np == pos.length && nn == neg.length, s"class $c counts")
      assert(math.abs(auc - brute) < 1e-9, s"class $c AUC $auc vs brute $brute")
    }
    // the +0.05 planted shift must make class 0 separable, others ~chance
    assert(rows(0L)._3 > 0.55, s"planted class AUC ${rows(0L)._3}")
    rows.filter(_._1 != 0L).values.foreach { case (_, _, a) =>
      assert(a > 0.3 && a < 0.62, s"unplanted class AUC $a")
    }
  }

  test("q_stats_auc: no unpartitioned window over fact-sized input") {
    val df = run("q_stats_auc")
    df.collect()
    val bad = collectAll(df.queryExecution.executedPlan) {
      case w: WindowExec if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("Sharded.globalPrefixSum equals the global running sum it replaces") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("long").as("q"))
      .withColumn("shard", col("l_partkey") % 5)
    val expect = df.withColumn("ps",
      coalesce(sum("q").over(Window
        .orderBy("shard", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val got = graft.ops.Sharded.globalPrefixSum(df, col("shard"),
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey")), col("q"), "ps")
    assert(got.count() == expect.count() &&
      got.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "ps")
        .except(expect.select("l_orderkey", "l_linenumber", "l_partkey",
          "l_suppkey", "ps")).isEmpty)
  }

  test("q_quality_calibration: bins tile the corpus; ECE equals the weighted gap sum") {
    val rows = run("q_quality_calibration").collect()
    val bins = rows.filter(_.getAs[Long]("bin") >= 0L)
    val ece = rows.find(_.getAs[Long]("bin") == -1L).get
    val n = Tables.embeddings(spark, sf).count()
    assert(bins.map(_.getAs[Long]("n")).sum == n)
    assert(ece.getAs[Long]("n") == n)
    // per-bin sanity: conf inside the bin's p-range (fixed-point floor
    // can only round down by < 1e-12), acc in [0,1]
    bins.foreach { r =>
      val b = r.getAs[Long]("bin")
      val conf = r.getAs[Double]("conf")
      val acc = r.getAs[Double]("acc")
      val lo = b / 10.0 - 1e-9
      val hi = if (b == 9L) 1.0 + 1e-9 else (b + 1) / 10.0 + 1e-9
      assert(conf >= lo && conf <= hi, s"bin $b conf $conf")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - math.abs(acc - conf)) < 1e-12)
    }
    val expectEce = bins.map(r =>
      r.getAs[Long]("n").toDouble * r.getAs[Double]("gap")).sum / n
    assert(math.abs(ece.getAs[Double]("gap") - expectEce) < 1e-9)
  }
}
