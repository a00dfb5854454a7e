package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for single-task global windows.
  *
  * A `row_number() OVER (ORDER BY ...)` with no PARTITION BY funnels the
  * entire input through ONE task — the classic one-core cliff this repo
  * bans over fact-sized frames (see SCALING.md, q_dedup_suffixlcp's
  * 2.4 s → 63 s at 10×). When the leading sort key can serve as a
  * shard, the global rank decomposes exactly into
  *
  *   rank(row) = offset(shard) + rank_within_shard(row)
  *
  * where `offset` is a prefix sum of per-shard counts — a window over
  * |shards| rows, orders of magnitude smaller than the fact table (and
  * at extreme shard counts the same decomposition recurses, the classic
  * tree prefix-sum). The within-shard ranks are a PARTITIONED window:
  * fully parallel, state bounded by the largest shard.
  *
  * The internal `__shard` column name is LOAD-BEARING: PlanLintSpec's
  * whole-surface linter accepts an unpartitioned window exactly when
  * its child aggregates solely on a column named `__shard`/`shard`
  * (this helper's offsets frame, or its hand-rolled twins). Renaming it
  * makes every caller's plan fail the lint — by design, that rename is
  * the review point.
  */
object Sharded {

  /** Exact global 1-based `row_number` over the total order
    * (shardCol, tieCols...), computed with no unpartitioned window over
    * `df`. `shardCol` MUST be the leading sort key (any expression
    * monotone in it shards correctly); `tieCols` must complete a unique
    * total order for determinism. Adds `out` and keeps all input
    * columns; `__shard` is dropped before returning.
    *
    * NULL shard keys are handled, not dropped: the offsets join is
    * null-safe (`<=>`), so a NULL shard forms its own group that sorts
    * first — consistent with `Window.orderBy`'s ASC NULLS FIRST. (A
    * plain inner join would silently drop every NULL-shard row.)
    */
  def globalRowNumber(df: DataFrame, shardCol: Column, tieCols: Seq[Column],
      out: String): DataFrame = {
    val withShard = df.withColumn("__shard", shardCol)
    val inShard = withShard.withColumn("__rn_in",
      row_number().over(
        Window.partitionBy("__shard").orderBy(tieCols: _*)))
    // |shards| rows: per-shard counts, then the one (tiny) ordered window
    val offsets = withShard.groupBy("__shard")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum("__cnt").over(Window.orderBy("__shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard").as("__oshard"), col("__off"))
    inShard.join(broadcast(offsets), col("__shard") <=> col("__oshard"))
      .withColumn(out, col("__off") + col("__rn_in"))
      .drop("__shard", "__oshard", "__rn_in", "__off")
  }

  /** Exact EXCLUSIVE global prefix sum of `valueCol` (BIGINT) over the
    * total order (shardCol, orderCols...), with no unpartitioned window
    * over `df`: within-shard exclusive cumsum (partitioned window) plus
    * a |shards|-row prefix-sum of the per-shard totals. Same contract
    * as [[globalRowNumber]] — `shardCol` must be the leading sort key
    * and (shardCol, orderCols) a deterministic order; NULL shard keys
    * join null-safely (one NULLS-FIRST group) rather than dropping.
    * Adds `out`.
    */
  def globalPrefixSum(df: DataFrame, shardCol: Column, orderCols: Seq[Column],
      valueCol: Column, out: String): DataFrame = {
    val withShard = df.withColumn("__shard", shardCol)
      .withColumn("__v", valueCol.cast("long"))
    val inShard = withShard.withColumn("__cum_in",
      coalesce(sum("__v").over(
        Window.partitionBy("__shard").orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = withShard.groupBy("__shard")
      .agg(sum("__v").as("__cnt"))
      .withColumn("__off",
        coalesce(sum("__cnt").over(Window.orderBy("__shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard").as("__oshard"), col("__off"))
    inShard.join(broadcast(offsets), col("__shard") <=> col("__oshard"))
      .withColumn(out, col("__off") + col("__cum_in"))
      .drop("__shard", "__oshard", "__v", "__cum_in", "__off")
  }
}
