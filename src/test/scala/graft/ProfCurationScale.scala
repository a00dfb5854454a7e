package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the curation surface (test scope:
  * `sbt "Test/runMain graft.ProfCurationScale [factors] [reps]"`,
  * e.g. `1,3,10 3`) — the round-8 sibling of [[ProfScale]] (dedup) and
  * [[ProfAnnScale]] (ANN): q_scrub_pii, q_split_hash, q_stats_datacard,
  * q_index_postings over synthesized document corpora, and q_dedup_url
  * over a scaled key table.
  *
  * Every query here is a LINEAR shape on paper — pure projections
  * (scrub, split), one groupBy (datacard, url), or two shuffles under a
  * shared per-term sort (postings) — so the pinned expectation is
  * runtime exponent ≈ 1 and flat per-row cost, unlike the dedup family
  * whose candidate volume grows superlinearly by construction. The
  * corpus is generated IN-FAMILY with the driver's documents table
  * (real-vocabulary bodies, 10..100 words, 20 sources, 10 languages) at
  * `factor` × the sf0.1 row counts. Results live in SCALING.md
  * §measured-curation.
  */
object ProfCurationScale {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    val vocab = spark.read.parquet(s"$baseSf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(col("count").desc)
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    val common = vocab.take(30)
    val baseDocs = spark.read.parquet(s"$baseSf/documents.parquet").count()
    val baseOrders = spark.read.parquet(s"$baseSf/orders.parquet").count()
    println(s"[curation-scale] base: $baseDocs docs, $baseOrders orders, vocab=${vocab.length}")

    def gen(factor: Int): String = {
      val n = (baseDocs * factor).toInt
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cur${factor}x").toString
      val rnd = new scala.util.Random(7 + factor)
      val texts = new Array[String](n)
      var i = 0
      while (i < n) {
        val len = 10 + rnd.nextInt(91)
        val sb = new StringBuilder
        var j = 0
        while (j < len) {
          if (j > 0) sb.append(' ')
          sb.append(common(rnd.nextInt(common.length)))
          j += 1
        }
        texts(i) = sb.toString
        i += 1
      }
      texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }.toSeq
        .toDF("doc_id", "text")
        .withColumn("lang", concat(lit("l"), (col("doc_id") % 10).cast("string")))
        .withColumn("source", concat(lit("src"), (col("doc_id") % 20).cast("string")))
        .withColumn("n_chars", length(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // q_dedup_url derives its raw URLs from o_orderkey alone; column
      // pruning means a single-column orders table is the honest input
      spark.range(1, baseOrders * factor + 1).select(col("id").as("o_orderkey"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }

    val queries = Seq("q_scrub_pii", "q_split_hash", "q_stats_datacard",
      "q_index_postings", "q_dedup_url")
    // JIT/codegen warmup so the smallest factor doesn't absorb compile cost
    queries.foreach { name =>
      try Bench.consume(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => }
    }
    releaseState()
    factors.foreach { f =>
      println(s"[curation-scale] ---- factor ${f}x (${baseDocs * f} docs / ${baseOrders * f} urls) ----")
      val dir = gen(f)
      queries.foreach { name =>
        val fn = SparkEntry.queries(name)
        val samples = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          Bench.consume(df)
          val dt = (System.nanoTime() - t0) / 1e9
          val rows = df.count()
          releaseState(); System.gc()
          (dt, rows)
        }
        val med = samples.map(_._1).sorted.apply(reps / 2)
        println(f"[curation-scale] $name%-20s ${f}x: median=$med%.2f s " +
          f"rows=${samples.head._2}%,d samples=${samples.map(s => f"${s._1}%.2f").mkString("[", ",", "]")}")
      }
    }
    spark.stop()
  }
}
