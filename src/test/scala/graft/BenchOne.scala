package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count()  // warmup
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      println(f"[benchone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
