package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Expose Spark's OWN Bloom-filter expressions (the pair behind
  * runtime-filter pushdown — `BloomFilterAggregate` builds the sketch,
  * `BloomFilterMightContain` probes it) as callable session functions.
  * Spark 4 ships both in catalyst but registers neither in the public
  * FunctionRegistry; this is a registration shim, not a
  * reimplementation — the sketch layout, hashing, and probe are
  * exactly the engine's.
  *
  * `graft_bloom_agg(xxhash64(x), estItems, numBits)` → BINARY sketch;
  * `graft_might_contain(sketch, xxhash64(x))` → BOOLEAN.
  */
object BloomFns {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
