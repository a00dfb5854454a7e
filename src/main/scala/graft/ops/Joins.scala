package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join shapes Spark's planner lacks a native strategy for, composed from
  * built-ins (extension-ladder step (a), SURVEY §4.2).
  */
object Joins {

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
