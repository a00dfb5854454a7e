package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 third-decade diagnostic: WHY do the iterative graph ops go
  * superlinear between 10× and 100× while pagerank/linkpred stay
  * linear? Candidate mechanisms, isolated on the labelprop loop at a
  * parametrized factor (`sbt "Test/runMain graft.ProfIterCkpt13 [factor]"`):
  *
  *   lazy   — the shipped shape: localCheckpoint(eager=false) per round
  *   eager  — localCheckpoint(eager=true) per round (forces each round
  *            to materialize ONCE, lineage provably truncated)
  *   none   — no checkpoints (4-round nested plan, recompute allowed)
  *
  * If lazy ≫ eager, the lazy checkpoint is NOT truncating lineage under
  * AQE (each round re-executes its predecessors; cost ∝ rounds²·edges —
  * invisible at 10×, dominant at 100×).
  */
object ProfIterCkpt13 {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.getOrElse("30").toInt
    val variants = args.lift(1).getOrElse("lazy,eager,none").split(",").toSeq
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li0 = spark.read.parquet(s"$baseSf/lineitem.parquet")
      .select("l_partkey", "l_suppkey")
    val maxPart = li0.agg(max("l_partkey")).head().getLong(0) + 1
    val maxSupp = li0.agg(max("l_suppkey")).head().getLong(0) + 1
    val dir = java.nio.file.Files.createTempDirectory(s"graft-iter$factor").toString
    li0.crossJoin(spark.range(factor).toDF("__i"))
      .select((col("l_partkey") + col("__i") * maxPart).as("l_partkey"),
        (col("l_suppkey") + col("__i") * maxSupp).as("l_suppkey"))
      .write.mode("overwrite").parquet(s"$dir/li.parquet")

    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    def labelprop(ckpt: String): DataFrame = {
      def stage(df: DataFrame): DataFrame = ckpt match {
        case "lazy" => df.localCheckpoint(eager = false)
        case "eager" => df.localCheckpoint(eager = true)
        case _ => df
      }
      val li = spark.read.parquet(s"$dir/li.parquet")
      val pairs = li.select((col("l_partkey") * 2).as("p"),
        (col("l_suppkey") * 2 + 1).as("q")).distinct()
      val edges = stage(pairs
        .select(col("p").as("src"), col("q").as("dst"))
        .union(pairs.select(col("q").as("src"), col("p").as("dst")))
        .repartition(col("src")))
      var labels = stage(edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")))
      for (_ <- 1 to 4) {
        labels = stage(edges
          .join(labels.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("c"))
          .groupBy("node")
          .agg(min_by(col("label"),
            struct((-col("c")).as("nc"), col("label"))).as("label")))
      }
      labels.orderBy("node")
    }

    variants.foreach { v =>
      val t0 = System.nanoTime()
      Bench.consume(labelprop(v))
      val dt = (System.nanoTime() - t0) / 1e9
      releaseState(); System.gc()
      println(f"[iter-ckpt] ${factor}x $v: $dt%.2f s")
    }
    spark.stop()
  }
}
