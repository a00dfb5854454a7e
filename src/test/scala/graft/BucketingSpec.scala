package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * eliminates the per-query shuffle entirely — at 100 TB this converts
  * every recurring fact-to-fact join from a full network shuffle into a
  * local merge. Proves the physical plan contains NO shuffle exchange. */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the join key plans without a shuffle") {
    // (warehouse dir is a static conf — tables land in ./spark-warehouse,
    // dropped in the finally block and gitignored)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = Tables.lineitem(spark, sf)
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.orders(spark, sf).write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.count() > 0)

      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // exactly one shuffle (the groupBy) — none for the join itself
      assert(shuffles.size <= 1, s"expected no join shuffle, got: $shuffles")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
