package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the round-9 closing batch
  * (`sbt "Test/runMain graft.ProfCorpusScale9b [factors] [reps]"`):
  * same corpus construction as [[ProfCorpusScale9]] — factor× disjoint
  * fact copies (offset order/event/doc/vec ids), dimensions fixed.
  *
  * Expectations:
  *  - q_graph_linkpred / q_graph_modularity: exponent ≈ 0 past the
  *    scan — copies reuse the SAME part/supp keys, so the distinct
  *    incidence (and hence wedge volume) does not grow at all; only
  *    the distinct() that reduces to it scales.
  *  - q_events_trend / q_events_changepoint: flat pair/window volume —
  *    copies land in the SAME hour buckets (values grow, bucket count
  *    doesn't), so the all-pairs step is provably span-bounded.
  *  - q_events_downsample / q_events_ohlc: exponent ≈ 1 (per-type
  *    ordinal windows grow with events; output stays bucket-bounded).
  *  - q_text_rake / q_text_keyness: exponent ≈ 1 for tokens, with the
  *    vocab-sized word-stats side flat (copies add no new words).
  *  - q_emb_matryoshka: exponent ≈ 1 (brute-force rankings scan all
  *    vectors; the IVF path would flatten this at real scale).
  *  - q_stats_ols / q_layout_zonemap: exponent ≈ 1 — pure scans into
  *    fixed-width aggregates.
  *
  * Results live in SCALING.md §measured-corpus9b.
  */
object ProfCorpusScale9b {
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
        .createTempDirectory(s"graft-c9bx$factor").toString
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

    val queries = Seq("q_graph_linkpred", "q_graph_modularity",
      "q_events_trend", "q_events_changepoint", "q_events_downsample",
      "q_events_ohlc", "q_text_rake", "q_text_keyness", "q_emb_matryoshka",
      "q_stats_ols", "q_layout_zonemap",
      // join-heavy closers: fact copies duplicate TEXTS, so the true
      // near-dup pair set itself grows ~factor² between copies — any
      // super-linear slope here is output growth, not algorithm
      // pathology (verify against the pair counts if a slope shows)
      "q_dedup_prefixjoin", "q_dedup_winnowing")
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
        println(f"[c9b-scale] ${f}x $q: $med%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
