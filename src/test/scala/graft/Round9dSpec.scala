package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.functions._

/** Plan + contract pins for the round-9 continuation batch (RAKE,
  * keyness, LTOB downsample, Theil–Sen trend, CUSUM change-point,
  * zone-map layout): output-size bounds, WindowGroupLimit pruning of
  * the argmax cuts, no cartesian/nested-loop joins in the pair steps,
  * and the zone-map pruning contract (range layout must beat hash). */
class Round9dSpec extends SparkSpec {

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

  test("q_events_downsample output is bounded by 64 x |types|; argmax uses WindowGroupLimit") {
    val df = run("q_events_downsample")
    val plan = df.queryExecution.executedPlan
    assert(collectAll(plan) { case w: WindowGroupLimitExec => w }.nonEmpty,
      "rk==1 per-bucket argmax must prune via WindowGroupLimit")
    val rows = df.collect()
    val types = rows.map(_.getString(0)).distinct.length
    assert(rows.length <= 64 * types, s"${rows.length} rows for $types types")
    // within a type, selected ordinals strictly increase across buckets
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ks = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ks.zip(ks.tail).forall { case (a, b) => a < b })
    }
  }

  test("q_events_trend pair join is keyed and the median slope is an occurring slope") {
    val df = run("q_events_trend")
    val plan = df.queryExecution.executedPlan
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "a.k < b.k must ride the event_type equi-join, not a nested loop")
    // brute-force lower median per type
    val hb = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        floor(col("value") * 1000000).cast("long").as("v"))
      .groupBy("event_type", "h").agg(sum("v").as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    df.collect().foreach { r =>
      val (t, nPairs, got) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val xs = hb.filter(_._1 == t).sortBy(_._2.getTime).map(_._3)
      val slopes = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield (xs(j) - xs(i)).toDouble / (j - i).toDouble
      assert(nPairs == slopes.length.toLong)
      assert(got == slopes.sorted.apply(((slopes.length + 1) / 2) - 1),
        s"$t median mismatch")
    }
  }

  test("q_events_changepoint matches a driver-side exact recomputation") {
    val got = run("q_events_changepoint").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(5))).toMap
    val hb = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        floor(col("value") * 1000000).cast("long").as("v"))
      .groupBy("event_type", "h").agg(sum("v").as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    got.foreach { case (t, (cpK, s)) =>
      val xs = hb.filter(_._1 == t).sortBy(_._2.getTime).map(_._3)
      val nb = xs.length.toLong
      val tx = xs.sum
      var px = 0L
      val sks = xs.zipWithIndex.map { case (x, i) =>
        px += x; (i + 1L, nb * px - (i + 1L) * tx)
      }
      val best = sks.maxBy { case (k, sk) => (math.abs(sk), -k) }
      assert(best._1 == cpK && best._2 == s, s"$t: got ($cpK,$s) want $best")
    }
  }

  test("q_layout_zonemap: range layout prunes, hash layout cannot") {
    val rows = run("q_layout_zonemap").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (hashFiles, hashFrac, _) = rows("hash")
    val (rangeFiles, rangeFrac, rangeRows) = rows("range")
    assert(hashFiles == 256 && rangeFiles == 256)
    // at sf0.001 a handful of 23-row hash files can miss the 90-day
    // window by chance, so pin "nearly full scan", not exactly 1.0
    assert(hashFrac > 0.9, s"hash files span the whole range: $hashFrac")
    assert(rangeFrac < 0.1, s"range layout must prune >90% of files: $rangeFrac")
    assert(rangeRows < 0.1, s"range layout must prune >90% of rows: $rangeRows")
    assert(hashFrac / rangeFrac > 10.0, "range must beat hash by >10x")
  }

  test("q_text_keyness top-10 cut prunes via WindowGroupLimit; rake windows all partitioned") {
    val kPlan = run("q_text_keyness").queryExecution.executedPlan
    assert(collectAll(kPlan) { case w: WindowGroupLimitExec => w }.nonEmpty)
    val rPlan = run("q_text_rake").queryExecution.executedPlan
    val unpartitioned = collectAll(rPlan) {
      case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.isEmpty, "rake must not use a global window")
  }
}
