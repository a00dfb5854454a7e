package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.graft.PlanBridge

/** Explicit runtime-filter construction — the engine-side pruning shape
  * Spark's own `InjectRuntimeFilter` rule produces, exposed as an operator
  * so a pipeline can apply it deliberately instead of depending on the
  * optimizer's size thresholds (`runtime.bloomFilter.applicationSideScanSizeThreshold`
  * defaults to 10 GB — correct for ad-hoc SQL, but a curated pipeline
  * KNOWS its batch-vs-corpus asymmetry up front).
  *
  * Scale shape: the bloom filter is built by one aggregation over the
  * SMALL side (partial sketches merge associatively, so the build is one
  * map-side-combined pass), ships to the big side's tasks as a scalar
  * subquery result (one sketch per executor, never per row), and prunes
  * the big side BEFORE its digests enter the dedup shuffle — at a corpus:
  * batch ratio of 50:1 that deletes ~98% of the standing corpus's shuffle
  * traffic for a false-positive residue the downstream equi-join removes
  * anyway. Pruning is semantics-preserving by construction: bloom filters
  * have no false negatives, so every row that could join survives.
  */
object RuntimeFilters {

  /** Filter `toPrune` down to rows whose `pruneKey` might appear among
    * `buildFrom`'s `buildKey` values, via an xxhash64-keyed bloom sketch
    * sized for `expectedItems` distinct build-side keys (~3% false
    * positives at the default sizing; over-estimating only costs sketch
    * bytes, never correctness).
    */
  def bloomPruned(toPrune: DataFrame, pruneKey: Column,
                  buildFrom: DataFrame, buildKey: Column,
                  expectedItems: Long): DataFrame = {
    val buildPlan = buildFrom.select(buildKey.as("_bf_key")).queryExecution.analyzed
    val keyAttr = buildPlan.output.head
    val sketch = new BloomFilterAggregate(new XxHash64(Seq(keyAttr)), expectedItems)
    val aggPlan = Aggregate(Nil,
      Seq(Alias(AggregateExpression(sketch, Complete, isDistinct = false), "_bf")()),
      buildPlan)
    val might = BloomFilterMightContain(ScalarSubquery(aggPlan),
      new XxHash64(Seq(PlanBridge.expression(pruneKey))))
    toPrune.filter(PlanBridge.column(might))
  }
}
