package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, GraftExtensions, SparkEntry}

/** Targeted single-query benchmark: `runMain graft.tools.BenchOne
  * <sfDir> <reps> <query>...` — same consume action, state release,
  * and list-major rep ordering as the full Bench, but only for the
  * named queries. Prints min/median per query. Driver-side profiling
  * tool (SCALING.md experiments), not part of the shipped surface.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Same intra-JVM stability confs as Bench (r17): without them a
      // multi-rep BenchOne run ages exactly like the r16 full bench did
      // (codegen-cache churn + status-store growth), so rep 4-5 medians
      // drift up and A/B comparisons lie.
      .config("spark.sql.codegen.cache.maxEntries", "16384")
      .config("spark.ui.retainedJobs", "300")
      .config("spark.ui.retainedStages", "500")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.sql.ui.retainedExecutions", "100")
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.stageCache.dir",
        sys.env.getOrElse("SPARK_GRAFT_STAGE_DIR",
          java.nio.file.Files.createTempDirectory("graft-stage").toString))
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // warmup at the smallest scale
    names.foreach { n =>
      Bench.consume(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
    }
    releaseState()
    val samples = scala.collection.mutable.Map(names.map(_ -> Vector.empty[Double]): _*)
    for (_ <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      Bench.consume(SparkEntry.queries(n)(spark, sfDir))
      samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
      releaseState()
      System.gc()
    }
    names.foreach { n =>
      val s = samples(n).sorted
      println(f"BENCHONE $n min=${s.head}%.2f med=${s(s.size / 2)}%.2f all=${s.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
