package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.AlbFixture

/** Session-config A/B for q_parse_alb: BenchOne's exact session (extensions,
  * default TZ) vs ProfAlb's (UTC, no extensions) measured 2.4s vs 1.8s for
  * the same plan — this isolates which query stage pays the difference.
  * `sbt "Test/runMain graft.ProfAlb2 /root/testdata/sf0.1"` */
object ProfAlb2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[prof2] $label%-28s run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = graft.etl.AlbLogParser.parse(
      AlbFixture.lines(spark, dir), "value", col("_src"))
    time("parse only")(base.select(count(lit(1))).head())
    time("parse+datefmt")(base.withColumn("log_timestamp",
      date_format(col("log_timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .select(count(lit(1))).head())
    time("parse+datefmt+orderBy")(AlbFixture.parsed(spark, dir)
      .select(count(lit(1))).head())
    time("registered q_parse_alb")(
      SparkEntry.queries("q_parse_alb")(spark, dir).count())
    // UA ladder share: same full parse but classifier columns replaced by
    // cheap surrogates over the same input column.
    import graft.functions.UaClassifier
    val lines = AlbFixture.lines(spark, dir)
    val noUa = graft.etl.AlbLogParser.parse(lines, "value", col("_src"))
      .withColumn("ua_browser_family", substring(col("user_agent_full"), 1, 4))
      .withColumn("ua_os_family", substring(col("user_agent_full"), 5, 4))
    time("parse, UA cols stubbed")(noUa.select(count(lit(1))).head())
    val onlyBrowser = graft.etl.AlbLogParser.parse(lines, "value", col("_src"))
      .withColumn("ua_os_family", substring(col("user_agent_full"), 5, 4))
    time("parse, os stubbed")(onlyBrowser.select(count(lit(1))).head())
    spark.stop()
  }
}
