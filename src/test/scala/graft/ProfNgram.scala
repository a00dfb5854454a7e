package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfNgram {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SortedIntersectSize.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ws0 = split(col("text"), " ")
    val bigrams = transform(sequence(lit(1), size(ws0) - 1),
      i => concat(element_at(ws0, i), lit("_"), element_at(ws0, i + 1)))
    val shingled = Tables.documents(spark, dir)
      .select(col("doc_id"), inline(array(struct(concat_ws(" ", bigrams).as("shingles")))))
    time("shingled count")(println("  " + shingled.count()))
    def wset = array_sort(array_distinct(split(col("shingles"), " ")))
    val byDigest = shingled.select(col("doc_id"),
      xxhash64(concat_ws(" ", wset)).as("digest"), wset.as("ws"))
    time("byDigest count")(println("  " + byDigest.count()))
    val sets = byDigest.select("digest", "ws").dropDuplicates("digest")
    time("sets count")(println("  " + sets.count()))
    val words = sets.select(col("digest"), explode(col("ws")).as("word"))
    time("words count")(println("  " + words.count()))
    val vocab = words.select("word").distinct()
    time("vocab count")(println("  " + vocab.count()))
    val vocabH = vocab.select(col("word") +: (0 until 16).map(i =>
      md5(concat(lit(s"$i|"), col("word")).cast("binary")).as(s"h$i")): _*)
    val sigs = words.join(vocabH, "word")
      .groupBy("digest").agg((0 until 16).map(i => min(col(s"h$i")).as(s"s$i")).head,
        (0 until 16).map(i => min(col(s"h$i")).as(s"s$i")).tail: _*)
    time("sigs count")(println("  " + sigs.count()))
    val bandCols = (0 until 4).map { j =>
      val slice = (0 until 4).map(r => col(s"s${j * 4 + r}"))
      xxhash64(concat_ws("|", slice: _*)).as(s"b$j")
    }
    val buckets = sigs.select(col("digest") +: bandCols: _*)
      .select(col("digest"), posexplode(array((0 until 4).map(j => col(s"b$j")): _*)))
      .toDF("digest", "band_idx", "bucket")
    val candRaw = buckets.as("x").join(buckets.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.digest") < col("y.digest"))
      .select(col("x.digest").as("g1"), col("y.digest").as("g2"))
    time("candRaw count")(println("  " + candRaw.count()))
    val cand = candRaw.distinct()
    time("cand count")(println("  " + cand.count()))
    val full = graft.ops.Dedup.minHashPairs(shingled, "doc_id", "shingles", 16, 4, 0.8)
    time("full pairs")(println("  " + full.count()))
    spark.stop()
  }
}
