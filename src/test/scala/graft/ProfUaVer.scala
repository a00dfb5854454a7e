package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.AlbFixture
import graft.functions.UaClassifier

/** Same-session stage A/B for q_ua_versions vs q_parse_alb (test scope:
  * `sbt "Test/runMain graft.ProfUaVer"`). */
object ProfUaVer {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[uav] $label%-26s run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("q_parse_alb count")(
      SparkEntry.queries("q_parse_alb")(spark, dir).count())
    val parsed = AlbFixture.parsed(spark, dir)
    time("family-only groupBy")(
      parsed.groupBy(col("ua_browser_family")).count().count())
    time("ua-only groupBy")(
      parsed.groupBy(col("user_agent_full")).count().count())
    time("family+version groupBy")(
      parsed.groupBy(col("ua_browser_family"),
        UaClassifier.browserMajor(col("user_agent_full"),
          col("ua_browser_family")).as("m")).count().count())
    time("q_ua_versions full")(
      SparkEntry.queries("q_ua_versions")(spark, dir).count())
    spark.stop()
  }
}
