package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the round-9 continuation batch
  * (`sbt "Test/runMain graft.ProfCorpusScale9 [factors] [reps]"`):
  * factor× disjoint copies of the sf0.1 corpora. Facts scale
  * (lineitem/orders get offset order keys, events/documents/embeddings
  * get offset ids); DIMENSIONS stay fixed (part/customer/supplier/
  * nation/region copied unchanged) — more facts per dimension row, the
  * realistic growth regime, and the one that keeps every dim join
  * semantically intact.
  *
  * Expectations:
  *  - q_tpch_marketshare / q_tpch_waiting / q_agg_skewkurt /
  *    q_text_winnowing / q_multimodal_phash / q_events_ratelimit /
  *    q_emb_covariance: exponent ≈ 1 (scans, key-local self-joins,
  *    fixed-width Gramian partials).
  *  - q_text_zipf: exponent < 1 — copies do not grow the vocabulary,
  *    so only the token count scales; rank + regression are constant.
  *
  * Results live in SCALING.md §measured-corpus9.
  */
object ProfCorpusScale9 {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
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
    val embeddings = spark.read.parquet(s"$baseSf/embeddings.parquet")
    val maxOrder = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    val maxEvent = events.agg(max("event_id")).head().getLong(0) + 1
    val maxDoc = documents.agg(max("doc_id")).head().getLong(0) + 1
    val maxVec = embeddings.agg(max("vec_id")).head().getLong(0) + 1

    def gen(factor: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-c9x$factor").toString
      (0 until factor).map(i => orders
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrder)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      (0 until factor).map(i => lineitem
          .withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOrder)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      (0 until factor).map(i => events
          .withColumn("event_id", col("event_id") + lit(i * maxEvent)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      (0 until factor).map(i => documents
          .withColumn("doc_id", col("doc_id") + lit(i * maxDoc)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      (0 until factor).map(i => embeddings
          .withColumn("vec_id", col("vec_id") + lit(i * maxVec)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      Seq("part", "customer", "supplier", "nation", "region").foreach { t =>
        spark.read.parquet(s"$baseSf/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      dir
    }

    val queries = Seq("q_tpch_marketshare", "q_tpch_waiting", "q_agg_skewkurt",
      "q_text_winnowing", "q_multimodal_phash", "q_events_ratelimit",
      "q_emb_covariance", "q_text_zipf")
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
        println(f"[c9-scale] ${f}x $q: $med%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
