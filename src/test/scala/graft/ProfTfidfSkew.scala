package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Zipf-skew comparison of q_text_tfidf (single shuffle-by-word join) vs
  * q_text_tfidf_skewsafe (df head broadcast + tail shuffle) — test scope:
  * `sbt "Test/runMain graft.ProfTfidfSkew [docs] [reps]"`.
  *
  * The corpus is adversarially Zipf: one head word appears in every
  * position with probability ~1/3 and 7 more head words cover most of
  * the rest, so a shuffle-by-word join funnels a third of all (doc,
  * word) rows through a single reducer. The skewsafe twin routes those
  * head rows via broadcast and never shuffles them. Both queries
  * produce identical output (same oracle); the numbers go to
  * SCALING.md §skew.
  */
object ProfTfidfSkew {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val reps = if (args.length > 1) args(1).toInt else 3
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

    // Zipf(≈1) over 8 head words + a 2000-word tail; 40 words per doc
    val rnd = new scala.util.Random(99)
    val texts = Array.tabulate(nDocs) { _ =>
      val sb = new StringBuilder
      var j = 0
      while (j < 40) {
        if (j > 0) sb.append(' ')
        val r = rnd.nextDouble()
        if (r < 0.55) sb.append(s"h${(r * 100).toInt % 8}") // head: 55% of tokens on 8 words
        else sb.append(s"t${rnd.nextInt(2000)}")
        j += 1
      }
      sb.toString
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-tfskew").toString
    texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }.toSeq
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val queries = Seq("q_text_tfidf", "q_text_tfidf_skewsafe")
    queries.foreach { name => // JIT warmup on the real small corpus
      try Bench.consume(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => }
    }
    releaseState()
    println(s"[tfskew] $nDocs docs × 40 tokens, 55% of tokens on 8 head words")
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
      println(f"[tfskew] $name%-24s median=$med%.2f s rows=${samples.head._2}%,d " +
        f"samples=${samples.map(s => f"${s._1}%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
