package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the q_dedup_minhash_ngram pipeline (test scope:
  * `sbt "Test/runMain graft.ProfNgram /root/testdata/sf0.1"`) — times the
  * digest/sets materialization, the signature aggregation, the banded
  * candidate join, and the full query, to show which phase owns the
  * family's second-slowest median. */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def time(label: String)(f: => Any): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      releaseState(); System.gc()
      println(f"[prof] $label%-22s run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val ws = split(col("text"), " ")
    val bigrams = graft.ops.TextAnalysis.bigrams(ws, "_")
    def shingled = Tables.documents(spark, dir)
      .select(col("doc_id"), inline(array(struct(bigrams.as("shingles")))))

    time("shingle+digest") {
      shingled.select(col("doc_id"),
        xxhash64(concat_ws(" ", array_sort(array_distinct(col("shingles")))))
          .as("digest")).select(countDistinct("digest")).head()
    }
    time("distinct sets+explode") {
      shingled.select(xxhash64(concat_ws(" ",
          array_sort(array_distinct(col("shingles"))))).as("digest"),
          array_distinct(col("shingles")).as("ws"))
        .dropDuplicates("digest")
        .select(col("digest"), explode(col("ws")))
        .select(count(lit(1))).head()
    }
    time("full pairs") {
      graft.ops.Dedup.minHashPairs(shingled, "doc_id", "shingles",
        16, 4, 0.8, tokenized = true).select(count(lit(1))).head()
    }
    spark.stop()
  }
}
