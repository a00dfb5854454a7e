package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.functions._

/** Join shapes Spark's planner lacks a native strategy for: composed from
  * built-ins where composition is enough (extension-ladder step (a),
  * SURVEY §4.2 — [[bandJoin]]), or a full custom logical+physical
  * operator where it is not (step (c) — [[asofBackward]]).
  */
object Joins {

  /** Backward as-of join via the native [[graft.plans.AsOfJoin]] operator:
    * each left row gains the right row with equal `keys` and the greatest
    * `rightTime <= leftTime` (left-outer; right columns nullable).
    *
    * The right side is re-projected with fresh aliases so self-joins
    * (both sides reading the same table) cannot collide on attribute ids
    * — which also means right-side column NAMES must differ from left's
    * if the caller wants to select them afterwards.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTime: String, rightTime: String): DataFrame =
    asof(left, right, leftKeys, rightKeys, leftTime, rightTime, forward = false)

  /** Forward as-of: smallest `rightTime >= leftTime` per key instead —
    * the "next event at/after" direction (e.g. first click after an
    * error). Same operator, time sort flipped. */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKeys: Seq[String], rightKeys: Seq[String],
                  leftTime: String, rightTime: String): DataFrame =
    asof(left, right, leftKeys, rightKeys, leftTime, rightTime, forward = true)

  private def asof(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTime: String, rightTime: String,
                   forward: Boolean): DataFrame = {
    val lplan = left.queryExecution.analyzed
    // fresh exprIds on the right: mandatory for self-joins
    val rAnalyzed = right.queryExecution.analyzed
    val rplan: LogicalPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofBackward: no column '$n' in ${plan.output.map(_.name)}"))
    // Runtime-injection fallback for sessions built without
    // GraftExtensions (mirrors the idempotent function registration).
    val exp = left.sparkSession.experimental
    if (!exp.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsOfJoinStrategy
    org.apache.spark.sql.graft.PlanBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoin(lplan, rplan,
        leftKeys.map(attr(lplan, _)), rightKeys.map(attr(rplan, _)),
        attr(lplan, leftTime), attr(rplan, rightTime), forward))
  }

  /** Interval-OVERLAP equi-bucketed join: all (l, r) pairs whose closed
    * integer intervals `[lStart, lEnd]` and `[rStart, rEnd]` intersect
    * (optionally per equi-key). Both sides explode to the bucket grid
    * their interval touches and join on (keys, bucket) with the exact
    * overlap predicate. A pair overlapping k shared buckets would appear
    * k times, so a second predicate keeps only the FIRST shared bucket —
    * `floor(max(lStart, rStart) / width)`, which both exploded ranges
    * contain whenever the intervals overlap — making each qualifying
    * pair match exactly once with no dedup step (the same trick as
    * q_join_range_bucketed; a full-row `distinct()` here would shuffle
    * wide payload rows AND collapse legitimately duplicate input rows).
    * Cost is O(pairs per bucket) with both sides partitioned by bucket,
    * vs the O(|L|·|R|) nested loop Spark plans for a raw overlap
    * predicate. Width should approximate the typical interval length:
    * too small explodes rows, too large fattens buckets.
    *
    * Naming contract: `keys` are the join columns (shared names); every
    * OTHER left/right column name must be disjoint across the two inputs
    * (same caveat as [[asofBackward]]) — rename upstream.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String],
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val l = left.withColumn("_ob",
      explode(sequence(floor(col(lStart) / width).cast("long"),
        floor(col(lEnd) / width).cast("long"))))
    val r = right.withColumn("_ob",
      explode(sequence(floor(col(rStart) / width).cast("long"),
        floor(col(rEnd) / width).cast("long"))))
    l.join(r, Seq("_ob") ++ keys)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_ob") === floor(greatest(col(lStart), col(rStart)) / width)
          .cast("long"))
      .drop("_ob")
  }

  /** Band (interval) equi-bucketed join: all (l, r) pairs with
    * `r ∈ [l - width, l + width]`.
    *
    * Spark plans a raw band predicate as a broadcast-nested-loop join —
    * O(|L|·|R|) and broadcast-bound. Quantizing both sides to
    * `floor(value / width)` buckets and exploding the right side to its
    * ±1 neighbor buckets turns it into a plain shuffled equi-join with a
    * residual filter: cost O(matching bucket pairs), both sides
    * partitioned by bucket — the standard scale path for range joins.
    *
    * Exactness: real arithmetic puts any qualifying pair within ±1
    * buckets, and for fixed-decimal inputs the only boundary-exact
    * quotients are exact multiples of `width`, which IEEE division
    * renders exactly — so the bucket window never misses a pair. Each
    * pair matches in exactly one bucket (the left row's), so no dedup is
    * needed. The residual predicate uses the same BETWEEN form a direct
    * join would, keeping results bit-identical.
    */
  def bandJoin(left: DataFrame, right: DataFrame,
               lCol: String, rCol: String, width: Double): DataFrame = {
    val lb = floor(col(lCol) / width).cast("long")
    val rb = floor(col(rCol) / width).cast("long")
    val l = left.withColumn("_band_bucket", lb)
    val r = right.withColumn("_band_bucket",
      explode(array(rb - 1, rb, rb + 1)))
    l.join(r, Seq("_band_bucket"))
      .filter(col(rCol) >= col(lCol) - width && col(rCol) <= col(lCol) + width)
      .drop("_band_bucket")
  }
}
