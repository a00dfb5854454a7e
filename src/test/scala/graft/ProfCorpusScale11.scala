package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the round-11 batch
  * (`sbt "Test/runMain graft.ProfCorpusScale11 [factors] [reps]"`):
  * the [[ProfCorpusScale10]] corpus (factor× disjoint fact copies,
  * dimensions fixed).
  *
  * Expectations:
  *  - q_layout_zorder / q_layout_hilbert: exponent ≈ 1 — THE round-11
  *    claim: the sharded rank replaced the single-task global sort, so
  *    10× data is 256 shards of 10× rows, fully parallel (the pre-fix
  *    shape would cliff like q_dedup_suffixlcp's 63 s did in r10).
  *  - q_agg_pareto: exponent ≈ 1 — orders scan grows; the ranked frame
  *    is customer-bounded but copies reuse custkeys, so the rollup is
  *    flat past the scan.
  *  - q_curation_dsir: exponent ≈ 1 — one (doc, bucket) combine scan;
  *    λ stays a 256-row dim; fold is in-row.
  *  - q_dedup_bloom: exponent ≈ 1 — sketch build + probe are both
  *    single scans; the sketch stays 32 KB regardless of corpus.
  *  - q_sample_reservoir: exponent ≈ 1 with a tiny constant —
  *    WindowGroupLimit keeps per-group state at k rows.
  *  - q_tpch_partsupp: ≈ 1 — the (partkey, suppkey) distinct grows
  *    sub-linearly (copies repeat pairs), NAAJ side is dim-bounded.
  *
  * Results live in SCALING.md §round-11.
  */
object ProfCorpusScale11 {
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
        .createTempDirectory(s"graft-c11x$factor").toString
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

    val queries =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Seq("q_layout_zorder", "q_layout_hilbert", "q_agg_pareto",
        "q_curation_dsir", "q_dedup_bloom", "q_sample_reservoir",
        "q_tpch_partsupp",
        // batch 2 + drift stats: bitmap rollup and KS are scan+combine
        // shapes; CEP is user-bounded after one collect; nearest rides
        // two as-of merges; rouge joins adjacent word-count frames
        "q_agg_bitmap_distinct", "q_join_nearest_tolerance", "q_events_cep",
        "q_text_rouge", "q_stats_ks", "q_stats_psi")
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
        println(f"[c11-scale] ${f}x $q: $med%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
