package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc round profiler for connected components (test scope only:
  * `sbt "Test/runMain graft.ProfCluster /root/testdata/sf0.1"`). */
object ProfCluster {
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
    graft.functions.SortedIntersectSize.register(spark)

    val docs = Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9)
      .persist()
    println(s"pairs rows=${pairs.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f".replace("%.2f", ""))

    // inline copy of connectedComponents with per-round timing
    val p = pairs
    val edges = p.select(col("d1").as("a"), col("d2").as("b"))
    val sym = edges.unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    println(s"sym rows=${sym.count()}")
    var labels = docs.select(col("doc_id").as("node"), col("doc_id").as("label"))
      .localCheckpoint()
    var frontier = labels
    var frontierSize = frontier.count()
    var i = 0
    while (frontierSize > 0 && i < 20) {
      val r0 = System.nanoTime()
      val msgs = sym.join(frontier.withColumnRenamed("node", "b"), Seq("b"))
        .select(col("a").as("node"), col("label"))
      val best = msgs.groupBy("node").agg(min("label").as("cand"))
      val merged = labels.join(best, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"),
          (col("cand") < col("label")).as("improved"))
        .localCheckpoint(eager = false)
      frontier = merged.filter(col("improved")).select("node", "label")
      frontierSize = frontier.count()
      labels = merged.select("node", "label")
      i += 1
      println(f"round $i: frontier=$frontierSize  ${(System.nanoTime() - r0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
