package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Zipf-skew stress profile for the bucket-capped LSH (test scope only:
  * `sbt "Test/runMain graft.ProfZipf"`).
  *
  * Generates a 5000-doc corpus whose words are drawn from a Zipf(1.2)
  * distribution over a 60-word vocabulary (seeded — reproducible), so
  * a handful of head words dominate every document and minhash band
  * buckets degenerate far beyond anything in the driver corpus. Then
  * measures, uncapped vs bucketCap=8:
  *   - the (band, bucket) occupancy histogram and the implied candidate
  *     count Σ b·(b−1)/2 (what the self-join must emit);
  *   - wall time and output size of the full verified pair pipeline.
  * Numbers are recorded in SCALING.md §skew.
  */
object ProfZipf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Worst-case skew: every document shares a 20-word head (the Zipf
    // body taken to its limit) plus 2 tail words from a 40-word pool —
    // distinct word sets (rep-collapse cannot save the self-join), but
    // the minhash minima come from the shared head, so thousands of
    // sets pile into the same (band, bucket) while pairwise Jaccard
    // (~20/24) sits BELOW the 0.9 threshold: maximal candidate work,
    // near-zero output — the adversarial regime the cap exists for.
    val rnd = new scala.util.Random(42)
    val head = (0 until 20).map(i => s"h$i").mkString(" ")
    val docs = (0 until 5000).map { i =>
      (i.toLong, s"$head t${rnd.nextInt(40)} u${rnd.nextInt(40)}")
    }.toDF("doc_id", "text")
      .repartition(32).localCheckpoint()  // fix the corpus before timing

    // band-bucket occupancy at digest granularity (the self-join's input)
    val ws = array_sort(array_distinct(split(col("text"), " ")))
    val sets = docs.select(xxhash64(concat_ws(" ", ws)).as("digest"), ws.as("ws"))
      .dropDuplicates("digest")
    println(s"docs=5000 distinct-sets=${sets.count()}")
    val sigs = graft.ops.Dedup.minHashSignatures(
      sets.select(col("digest").as("doc_id"),
        concat_ws(" ", col("ws")).as("text")), "doc_id", "text", 16)
    val bandCols = (0 until 4).map { j =>
      val slice = (0 until 4).map(r => col(s"s${j * 4 + r}"))
      xxhash64(concat_ws("|", slice: _*)).as(s"b$j")
    }
    val occupancy = sigs.select(col("doc_id") +: bandCols: _*)
      .select(posexplode(array((0 until 4).map(j => col(s"b$j")): _*)))
      .toDF("band_idx", "bucket")
      .groupBy("band_idx", "bucket").count()
      .agg(max("count").as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("implied_candidates"))
      .collect()(0)
    println(s"max bucket=${occupancy.get(0)} implied candidate pairs=${occupancy.get(1)}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-14s rows=$n%,d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // uncapped vs capped full pipelines (verified doc-level pairs)
    time("uncapped") {
      graft.ops.Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9).count()
    }
    time("capped(8)") {
      graft.ops.Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9, bucketCap = 8).count()
    }
    spark.stop()
  }
}
