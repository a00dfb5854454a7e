package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: size the digest-level dedup graph vs the doc-level one
  * (test scope only: `sbt "Test/runMain graft.ProfDigestCC <sfDir>"`). */
object ProfDigestCC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SortedIntersectSize.register(spark)

    val docs = Tables.documents(spark, dir)
    def ws = array_sort(array_distinct(split(col("text"), " ")))
    val byDigest = docs.select(col("doc_id"),
      xxhash64(concat_ws(" ", ws)).as("digest"))
    println("docs         = " + docs.count())
    println("digests      = " + byDigest.select("digest").distinct().count())
    val pairs = graft.ops.Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9)
    val members = byDigest
    val withDig = pairs
      .join(members.select(col("doc_id").as("d1"), col("digest").as("g1")), "d1")
      .join(members.select(col("doc_id").as("d2"), col("digest").as("g2")), "d2")
    println("doc pairs    = " + pairs.count())
    println("cross pairs  = " + withDig.filter(col("g1") =!= col("g2"))
      .select("g1", "g2").distinct().count())
    spark.stop()
  }
}
