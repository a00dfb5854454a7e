package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the minhash pair pipeline (test scope only:
  * `sbt "Test/runMain graft.ProfMinhash /root/testdata/sf0.1"`). */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    graft.functions.SortedIntersectSize.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    def ws = array_sort(array_distinct(split(col("text"), " ")))
    val byDigest = docs.select(col("doc_id"),
      xxhash64(concat_ws(" ", ws)).as("digest"), ws.as("ws"))
    val sets = byDigest.select("digest", "ws").dropDuplicates("digest")
    time("byDigest count")(println("  rows=" + byDigest.count()))
    time("sets count")(println("  rows=" + sets.count()))

    val words = sets.select(col("digest"), explode(col("ws")).as("word"))
    time("words count")(println("  rows=" + words.count()))
    val vocab = words.select("word").distinct()
    time("vocab count")(println("  rows=" + vocab.count()))

    val vocabH = vocab.select(col("word") +: (0 until 16).map(i =>
      md5(concat(lit(s"$i|"), col("word")).cast("binary")).as(s"h$i")): _*)
    val sigExprs = (0 until 16).map(i => min(col(s"h$i")).as(s"s$i"))
    val sigs = words.join(vocabH, "word")
      .groupBy("digest").agg(sigExprs.head, sigExprs.tail: _*)
    time("sigs count")(println("  rows=" + sigs.count()))

    val bandCols = (0 until 4).map { j =>
      val slice = (0 until 4).map(r => col(s"s${j * 4 + r}"))
      xxhash64(concat_ws("|", slice: _*)).as(s"b$j")
    }
    val buckets = sigs.select(col("digest") +: bandCols: _*)
      .select(col("digest"), posexplode(array((0 until 4).map(j => col(s"b$j")): _*)))
      .toDF("digest", "band_idx", "bucket")
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.digest") < col("y.digest"))
      .select(col("x.digest").as("g1"), col("y.digest").as("g2"))
      .distinct()
    time("cand count")(println("  rows=" + cand.count()))

    val sizes = sets.select(col("digest"), size(col("ws")).as("sz"))
    val ratioOk = cand
      .join(sizes.as("sx"), col("g1") === col("sx.digest"))
      .join(sizes.as("sy"), col("g2") === col("sy.digest"))
      .filter(least(col("sx.sz"), col("sy.sz")).cast("double")
        / greatest(col("sx.sz"), col("sy.sz")) >= 0.9)
      .select("g1", "g2")
    time("ratioOk count")(println("  rows=" + ratioOk.count()))

    val full = graft.ops.Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9)
    time("full pairs count")(println("  rows=" + full.count()))
    time("full pairs count 2nd")(println("  rows=" + full.count()))
    spark.stop()
  }
}
