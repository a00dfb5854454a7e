package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the dedup family (test scope:
  * `sbt "Test/runMain graft.ProfScale [factors] [reps]"`, e.g. `1,10 3`).
  *
  * SCALING.md's arguments past sf0.1 were structural until round 7; this
  * harness measures them. It synthesizes corpora IN-FAMILY with the
  * driver's documents table — the vocabulary is read from the real sf0.1
  * corpus (so word-set density, and with it candidate-pair structure,
  * matches), doc lengths are uniform 10..100 words, and ~0.16% of docs
  * are exact copies of earlier ones — at `factor` × the sf0.1 document
  * count, then runs q_dedup_minhash / q_dedup_cluster /
  * q_dedup_substring solo (median of `reps`, state released between
  * samples, same protocol as BenchOne) and reports the scale metrics
  * that matter for the runtime exponent:
  *   - distinct word-set digests (the LSH self-join's input),
  *   - implied candidate pairs Σ b·(b−1)/2 over (band, bucket) occupancy
  *     at digest granularity (what the self-join must emit uncapped),
  *   - verified pair count (the clustering edge input).
  * The pinned expectation: runtime growth ≲ candidate-pair growth, and
  * no OOM at the configured heap. Results live in SCALING.md §measured.
  */
object ProfScale {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,10").split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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

    // In-family vocabulary: the real corpus's words at their real ranks
    // (near-uniform over ~30 words + a rare tail token). Sampling uniform
    // over the same vocab reproduces the word-SET saturation that makes
    // this corpus the dedup family's dense regime.
    val vocab = spark.read.parquet(s"$baseSf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(col("count").desc)
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    val common = vocab.take(30)
    println(s"[scale] vocab=${vocab.length} words (top30 used for the body)")

    val baseDocs = spark.read.parquet(s"$baseSf/documents.parquet").count()

    def gen(factor: Int): String = {
      val n = (baseDocs * factor).toInt
      val dir = java.nio.file.Files.createTempDirectory(s"graft-scale${factor}x").toString
      val rnd = new scala.util.Random(42 + factor)
      // driver-side generation of n strings is fine here: this is a test
      // harness building an INPUT corpus, not a distributed operator
      val texts = new Array[String](n)
      var i = 0
      while (i < n) {
        if (i > 100 && rnd.nextDouble() < 0.0016) {
          texts(i) = texts(rnd.nextInt(i)) // exact dup of an earlier doc
        } else {
          val len = 10 + rnd.nextInt(91)
          val sb = new StringBuilder
          var j = 0
          while (j < len) {
            if (j > 0) sb.append(' ')
            sb.append(common(rnd.nextInt(common.length)))
            j += 1
          }
          texts(i) = sb.toString
        }
        i += 1
      }
      texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }.toSeq
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", concat(lit("src"), (col("doc_id") % 20).cast("string")))
        .withColumn("n_chars", length(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    def scaleMetrics(dir: String): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val ws = array_sort(array_distinct(split(col("text"), " ")))
      val sets = docs.select(xxhash64(concat_ws(" ", ws)).as("digest"),
        concat_ws(" ", ws).as("text")).dropDuplicates("digest")
        .localCheckpoint()
      val nSets = sets.count()
      val sigs = graft.ops.Dedup.minHashSignatures(
        sets.select(col("digest").as("doc_id"), col("text")), "doc_id", "text", 16)
      val bandCols = (0 until 4).map { j =>
        val slice = (0 until 4).map(r => col(s"s${j * 4 + r}"))
        xxhash64(concat_ws("|", slice: _*)).as(s"b$j")
      }
      val occ = sigs.select(col("doc_id") +: bandCols: _*)
        .select(posexplode(array((0 until 4).map(j => col(s"b$j")): _*)))
        .toDF("band_idx", "bucket")
        .groupBy("band_idx", "bucket").count()
        .agg(max("count"), sum(col("count") * (col("count") - 1) / 2))
        .collect()(0)
      val verified = graft.ops.Dedup
        .minHashPairs(docs, "doc_id", "text", 16, 4, 0.9).count()
      println(f"[scale] docs=${docs.count()}%,d distinct-sets=$nSets%,d " +
        f"max-bucket=${occ.get(0)} implied-candidates=${occ.get(1)} " +
        f"verified-pairs=$verified%,d")
      releaseState()
    }

    val queries = Seq("q_dedup_minhash", "q_dedup_cluster", "q_dedup_substring")
    factors.foreach { f =>
      println(s"[scale] ---- factor ${f}x (≈ sf${0.1 * f}) ----")
      val dir = gen(f)
      scaleMetrics(dir)
      queries.foreach { name =>
        val fn = SparkEntry.queries(name)
        val samples = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          releaseState(); System.gc()
          (dt, n)
        }
        val med = samples.map(_._1).sorted.apply(reps / 2)
        println(f"[scale] $name%-22s ${f}x: median=$med%.2f s " +
          f"rows=${samples.head._2}%,d samples=${samples.map(s => f"${s._1}%.2f").mkString("[", ",", "]")}")
      }
    }
    spark.stop()
  }
}
