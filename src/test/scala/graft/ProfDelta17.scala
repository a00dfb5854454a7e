package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 measurement for the q_graph_labelprop_delta re-point: per-
  * round changed-node counts (Δᵢ) under a SEMI-SYNCHRONOUS schedule
  * (odd rounds update odd-side nodes, even rounds even-side — the
  * Raghavan et al. §3 two-coloring that breaks the bipartite 2-cycle)
  * on the thresholded ≥2-co-occurrence graph. The r16 finding was that
  * the SYNCHRONOUS schedule oscillates (Δ = N every round); this
  * measures whether the alternating schedule actually converges, and in
  * how many rounds, before the query + unrolled oracle pin a cap.
  * Usage: Test/runMain graft.ProfDelta17 [sfDir] [maxRounds]
  */
object ProfDelta17 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxRounds = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("q"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("p", "q")
    val edges = pairs.select(col("p").as("src"), col("q").as("dst"))
      .union(pairs.select(col("q").as("src"), col("p").as("dst")))
      .repartition(col("src")).localCheckpoint(eager = true)
    val base = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(eager = true)
    println(s"[delta17] nodes=${base.count()} edges=${edges.count()}")
    val t0 = System.nanoTime()
    var delta = base
    var pieces = Vector(base.withColumn("r", lit(0)))
    def cur() = pieces.reduce(_ unionByName _)
      .groupBy("node").agg(max_by(col("label"), col("r")).as("label"))
    var i = 0
    var emptyAt = -1
    while (i < maxRounds && emptyAt < 0) {
      i += 1
      val side = i % 2 // odd rounds: odd nodes (suppliers)
      val affected = edges.join(delta.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .filter(col("node") % 2 === side)
      val curLabels = cur()
      val recomputed = edges
        .join(affected.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .filter(col("dst") % 2 === side)
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
      delta = graft.ops.RoundState.pinned(nextDelta)
      pieces = pieces :+ delta.withColumn("r", lit(i))
      val d = delta.count()
      println(s"[delta17] round $i (side $side): delta=$d")
      if (d == 0) emptyAt = i
    }
    val labels = cur().localCheckpoint(eager = true)
    val nLabels = labels.select("label").distinct().count()
    println(f"[delta17] converged=${emptyAt >= 0} at round $emptyAt, " +
      f"distinct labels=$nLabels, wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
