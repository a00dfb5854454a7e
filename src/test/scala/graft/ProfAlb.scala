package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.{AlbFixture, AlbLogParser}
import graft.functions.UaClassifier

/** Stage profiler for q_parse_alb (test scope:
  * `sbt "Test/runMain graft.ProfAlb /root/testdata/sf0.1"`). */
object ProfAlb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-24s run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val lines = AlbFixture.lines(spark, dir)
    time("lines only")(lines.select(sum(length(col("value")))).head())
    val tok = from_csv(col("value"), org.apache.spark.sql.types.StructType(
      (0 until 35).map(i => org.apache.spark.sql.types.StructField(s"t$i",
        org.apache.spark.sql.types.StringType, true))),
      Map("sep" -> " ", "quote" -> "\"", "escape" -> "\\", "mode" -> "PERMISSIVE"))
    time("lines+tokenize")(lines.select(inline(array(tok)))
      .select(sum(length(col("t13")))).head())
    time("lines+tok+ua ladder")(lines.select(inline(array(tok)))
      .select(sum(length(UaClassifier.browserFamily(col("t13")))) +
        sum(length(UaClassifier.osFamily(col("t13"))))).head())
    time("full parse")(AlbLogParser.parse(lines, "value", col("_src"))
      .select(count(lit(1))).head())
    time("full q_parse_alb")(AlbFixture.parsed(spark, dir).select(count(lit(1))).head())
    spark.stop()
  }
}
