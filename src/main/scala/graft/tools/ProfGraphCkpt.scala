package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, GraftExtensions, Tables}

/** Round-11 experiment (VERDICT item 7): is the graph family's ~4-5 s
  * sf0.1 constant the per-round LAZY localCheckpoint, or intrinsic
  * join/shuffle work? Times three pagerank/labelprop variants:
  *   A. as shipped (lazy localCheckpoint per round)
  *   B. no per-round checkpoints at all (one deep plan)
  *   C. eager localCheckpoint per round (the "reliable-ish" shape)
  * Findings recorded in SCALING.md §graph-checkpoints.
  */
object ProfGraphCkpt {
  def pagerank(s: SparkSession, d: String, mode: String): DataFrame = {
    val pairs = Tables.lineitem(s, d).select(
      (col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("q")).distinct()
    def ck(df: DataFrame): DataFrame = mode match {
      case "lazy" | "part" => df.localCheckpoint(eager = false)
      case "eager" => df.localCheckpoint(eager = true)
      case _ => df
    }
    val rawEdges = pairs.select(col("p").as("src"), col("q").as("dst"))
      .union(pairs.select(col("q").as("src"), col("p").as("dst")))
    val edges = ck(if (mode == "part") rawEdges.repartition(col("src")) else rawEdges)
    val outdeg = ck(edges.groupBy("src").agg(count(lit(1)).as("outdeg")))
    val nodes = ck(edges.select(col("src").as("node")).distinct())
    var rank = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to 3) {
      val contribs = edges
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      rank = ck(nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(coalesce(in_mass, 0L) * 85) div 100")).as("rank")))
    }
    rank.orderBy("node")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def release(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    for (mode <- Seq("lazy", "part", "none", "eager"); _ <- 1 to 2)
      { Bench.consume(pagerank(spark, "/root/testdata/sf0.001", mode)); release() }
    for (rep <- 1 to 3; mode <- Seq("lazy", "part", "none", "eager")) {
      val t0 = System.nanoTime()
      Bench.consume(pagerank(spark, sfDir, mode))
      println(f"PROF pagerank mode=$mode%-6s rep=$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      release(); System.gc()
    }
    spark.stop()
  }
}
