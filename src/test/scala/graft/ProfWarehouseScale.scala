package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the round-9 warehouse/analytics batch
  * (test scope: `sbt "Test/runMain graft.ProfWarehouseScale [factors] [reps]"`,
  * e.g. `1,3,10 2`): factor× disjoint shifted copies of the sf0.1
  * orders/lineitem/events/documents corpora (key spaces offset per
  * copy; event timestamps and document texts unchanged — more
  * users/customers/docs over the same window, the scale-out regime).
  *
  * Expectations this measures:
  *  - q_merge_cdc / q_snapshot_diff / q_customer_rfm /
  *    q_quality_constraints / q_basket_pairs / q_events_engagement /
  *    q_events_concurrency / q_multimodal_audio: exponent ≈ 1 (all
  *    corpus-scaled work is partial-aggregated scans + key-local
  *    joins).
  *  - q_text_bpe_train: exponent < 1 — copies do not grow the
  *    VOCABULARY, so only the initial token count scales while every
  *    merge round's work stays constant (the reduce-to-vocab claim).
  *
  * Results live in SCALING.md §measured-warehouse.
  */
object ProfWarehouseScale {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    val orders = spark.read.parquet(s"$baseSf/orders.parquet")
    val lineitem = spark.read.parquet(s"$baseSf/lineitem.parquet")
    val events = spark.read.parquet(s"$baseSf/events.parquet")
    val documents = spark.read.parquet(s"$baseSf/documents.parquet")
    val maxOrder = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    val maxCust = orders.agg(max("o_custkey")).head().getLong(0) + 1
    val maxPart = lineitem.agg(max("l_partkey")).head().getLong(0) + 1
    val maxUser = events.agg(max("user_id")).head().getLong(0) + 1
    val maxEvent = events.agg(max("event_id")).head().getLong(0) + 1
    val maxDoc = documents.agg(max("doc_id")).head().getLong(0) + 1

    def gen(factor: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-wh$factor").toString
      (0 until factor).map(i => orders
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrder))
          .withColumn("o_custkey", col("o_custkey") + lit(i * maxCust)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      (0 until factor).map(i => lineitem
          .withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOrder))
          .withColumn("l_partkey", col("l_partkey") + lit(i * maxPart)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      (0 until factor).map(i => events
          .withColumn("event_id", col("event_id") + lit(i * maxEvent))
          .withColumn("user_id", col("user_id") + lit(i * maxUser)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      (0 until factor).map(i => documents
          .withColumn("doc_id", col("doc_id") + lit(i * maxDoc)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    val queries = Seq("q_merge_cdc", "q_snapshot_diff", "q_customer_rfm",
      "q_quality_constraints", "q_basket_pairs", "q_text_bpe_train",
      "q_events_engagement", "q_events_concurrency", "q_multimodal_audio")
    for (f <- factors) {
      val dir = gen(f)
      queries.foreach { q =>
        val fn = SparkEntry.queries(q)
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          Bench.consume(fn(spark, dir))
          releaseState(); System.gc()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = times((times.size - 1) / 2)
        println(f"[wh-scale] ${f}x $q: $med%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
