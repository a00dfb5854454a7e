package graft
import org.apache.spark.sql.SparkSession

/** Solo family bench: times the named queries in sequence under the same
  * config as Bench (stage cache ON, state release between queries), so a
  * substrate-staging change can be measured without a full sweep. */
object BenchFamily {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.stageCache.dir",
        java.nio.file.Files.createTempDirectory("graft-stage").toString)
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val names = args.toSeq
    names.foreach { n =>
      Bench.consume(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
    }
    releaseState()
    var total = 0.0
    for (pass <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      Bench.consume(SparkEntry.queries(n)(spark, "/root/testdata/sf0.1"))
      val dt = (System.nanoTime() - t0) / 1e9
      releaseState()
      if (pass == 2) total += dt
      println(f"[benchfamily] pass $pass $n: $dt%.2f s")
    }
    println(f"[benchfamily] pass-2 total: $total%.2f s")
    spark.stop()
  }
}
