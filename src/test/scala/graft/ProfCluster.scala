package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc round profiler for connected components (test scope only:
  * `sbt "Test/runMain graft.ProfCluster /root/testdata/sf0.1"`). */
object ProfCluster {
  def main(args: Array[String]): Unit = {
    sys.props("graft.cc.profile") = "1"
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SortedIntersectSize.register(spark)

    val docs = Tables.documents(spark, dir)
    val t2 = System.nanoTime()
    val clusters = graft.ops.Dedup.dedupClusters(docs, "doc_id", "text", 16, 4, 0.9)
    val m = clusters.groupBy("cluster_rep").count().count()
    println(f"dedupClusters (digest-level): $m components in " +
      f"${(System.nanoTime() - t2) / 1e9}%.2f s")

    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9)
      .persist()
    println(f"pairs rows=${pairs.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val labels = graft.ops.Dedup.connectedComponents(
      docs.select(col("doc_id").as("node")), pairs)
    val n = labels.groupBy("cluster_rep").count().count()
    println(f"doc-level cc: $n components in ${(System.nanoTime() - t1) / 1e9}%.2f s " +
      f"(total ${(System.nanoTime() - t0) / 1e9}%.2f s)")
    spark.stop()
  }
}
