package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the round-10 batch
  * (`sbt "Test/runMain graft.ProfCorpusScale10 [factors] [reps]"`):
  * factor× disjoint fact copies (offset order/event/doc/vec ids),
  * dimensions fixed — the [[ProfCorpusScale9b]] corpus.
  *
  * Expectations:
  *  - q_layout_hilbert: exponent ≈ 1 — the range-sort + manifest scan
  *    grows with facts; the 4 flip/swap steps are per-row codegen.
  *  - q_graph_labelprop: flat past the distinct — copies reuse the
  *    SAME part/supp keys, so the incidence (and all 4 rounds) do not
  *    grow at all.
  *  - q_dedup_suffixlcp: exponent ≈ 1 — suffix sample rows grow with
  *    docs; the sort carries capped 64-char keys only.
  *  - q_agg_countmin: sub-linear — the token count scans linearly but
  *    every post-vocab stage (cells, probes) is vocabulary-bounded and
  *    copies add no new words.
  *  - q_multimodal_phash_neardup: exponent ≈ 1 for the decode; copies
  *    make every image an exact f-fold duplicate, so buckets hit the
  *    16-member cap and the PAIR JOIN stays bounded — the cap doing
  *    its job is the test.
  *  - q_mix_temperature / q_events_forecast_snaive: linear scan into
  *    source-/bucket-bounded frames.
  *  - q_emb_hamming: exponent ≈ 1 (per-query scan of all signatures).
  *  - q_stats_bootstrap / q_text_winnowing (round-10 reworks): linear
  *    map-only scans — the rework claim is precisely that nothing
  *    super-linear is left.
  *  - q_stats_ttest / q_text_fertility / q_dedup_cross_sources /
  *    q_similarity_recall_sweep (batch 3/4): flat-to-sublinear —
  *    group-/vocab-/probe-bounded after one scan.
  *
  * Results live in SCALING.md §round-10.
  */
object ProfCorpusScale10 {
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
        .createTempDirectory(s"graft-c10x$factor").toString
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

    val queries = Seq("q_layout_hilbert", "q_graph_labelprop",
      "q_dedup_suffixlcp", "q_agg_countmin", "q_multimodal_phash_neardup",
      "q_mix_temperature", "q_emb_hamming", "q_events_forecast_snaive",
      "q_stats_bootstrap", "q_text_winnowing",
      // batch 3/4 closers
      "q_stats_ttest", "q_text_fertility", "q_dedup_cross_sources",
      "q_similarity_recall_sweep")
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
        println(f"[c10-scale] ${f}x $q: $med%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
