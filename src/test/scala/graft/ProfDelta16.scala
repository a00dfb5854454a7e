package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for the q_graph_labelprop_delta scaladoc: per-
  * round changed-pair counts (Δᵢ) vs the full frame, at a given SF dir.
  * Usage: Test/runMain graft.ProfDelta16 [sfDir]
  */
object ProfDelta16 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("q"))
      .distinct()
    val edges = pairs.select(col("p").as("src"), col("q").as("dst"))
      .union(pairs.select(col("q").as("src"), col("p").as("dst")))
      .repartition(col("src")).localCheckpoint(eager = true)
    val base = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(eager = true)
    println(s"[delta16] nodes=${base.count()} edges=${edges.count()}")
    var delta = base
    var pieces = Vector(base.withColumn("r", lit(0)))
    def cur() = pieces.reduce(_ unionByName _)
      .groupBy("node").agg(max_by(col("label"), col("r")).as("label"))
    for (i <- 1 to 4) {
      val affected = edges.join(delta.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
      val curLabels = cur()
      val recomputed = edges
        .join(affected.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .join(curLabels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min_by(col("label"),
          struct((-col("c")).as("nc"), col("label"))).as("label"))
      val nextDelta = recomputed.as("n")
        .join(curLabels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .select(col("n.node").as("node"), col("n.label").as("label"))
      delta = nextDelta.localCheckpoint(eager = true)
      pieces = pieces :+ delta.withColumn("r", lit(i))
      println(s"[delta16] round $i: affected=${affected.count()} delta=${delta.count()}")
    }
    spark.stop()
  }
}
