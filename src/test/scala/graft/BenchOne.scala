package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val fn = SparkEntry.queries(name)
    // mirror Bench: release cache/checkpoint blocks between runs so each
    // run measures the same cold-block, warm-JIT state the driver sees
    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // same pruning-proof hash-reduction action as Bench.consume, so solo
    // medians stay comparable with in-bench medians
    Bench.consume(fn(spark, "/root/testdata/sf0.001"))  // warmup
    releaseState()
    val reps = if (args.length > 1) args(1).toInt else 3
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      Bench.consume(fn(spark, "/root/testdata/sf0.1"))
      val dt = (System.nanoTime() - t0) / 1e9
      releaseState()
      System.gc()
      println(f"[benchone] $name run $i: $dt%.2f s")
    }
    spark.stop()
  }
}
