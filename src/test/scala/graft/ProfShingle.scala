package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc comparison of bigram-shingle construction strategies (test
  * scope only: `sbt "Test/runMain graft.ProfShingle /root/testdata/sf0.1"`).
  * The ngram dedup family's floor is this construction — the LSH tail is
  * tiny by comparison — so the per-row expression shape matters. */
object ProfShingle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[prof] $label%-22s run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val docs = Tables.documents(spark, dir)
    val ws = split(col("text"), " ")

    // (a) current: index walk via sequence + element_at
    val viaSeq = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit("_"), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    // (b) zip_with over the array and its shifted copy
    val viaZip = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>"))

    time("seq+element_at") {
      docs.select(sum(size(array_distinct(viaSeq)))).head()
    }
    time("zip_with+slice") {
      docs.select(sum(size(array_distinct(viaZip)))).head()
    }
    // sanity: identical output
    val diff = docs.select(viaSeq.as("a"), viaZip.as("b"))
      .filter(not(col("a") === col("b"))).count()
    println(s"[prof] construction mismatch rows: $diff")
    spark.stop()
  }
}
