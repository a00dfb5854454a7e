package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver corpus (TESTDATA.md).
  *
  * All tables are single parquet files; Spark's vectorized parquet reader
  * handles them with column pruning + predicate pushdown. At 100 TB these
  * would be partitioned directories — the same `read.parquet(dir)` call
  * handles that transparently (partition pruning via Catalyst).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses outright — read nanos as long (legacy conf) and convert to a
    * microsecond TimestampType (truncation, matching Spark's own µs model). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    // integer `div`, NOT `/`: Long / Long is double division in Spark and
    // ~1.7e18 ns exceeds double precision (rounds up to the next µs)
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
