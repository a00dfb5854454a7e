package graft

import org.apache.spark.sql.functions._

/** Partitioned parquet sink + partition-pruned scan — the layout that makes
  * 100 TB queryable: a predicate on the partition column must prune at the
  * file-listing level (no data files of other partitions read at all). */
class PartitionedWriteSpec extends SparkSpec {

  test("write partitioned by event_type; reads prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("evpart").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val clicks = spark.read.parquet(dir).filter(col("event_type") === "click")
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(clicks.count() == expected)

    // partition pruning is visible in the scan's selected partitions
    val scan = clicks.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "expected partition filters on the scan")
    assert(scan.relation.location.inputFiles.forall(_.contains("event_type=")))
    assert(scan.metadata("PartitionFilters").contains("event_type"))
  }

  test("compactParquet merges a 64-file directory into ~target-sized files") {
    def partFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet"))
    val small = java.nio.file.Files.createTempDirectory("smallfiles").toString
    Tables.lineitem(spark, sf).repartition(64)
      .write.mode("overwrite").parquet(small)
    assert(partFiles(small).size == 64)

    val out = java.nio.file.Files.createTempDirectory("compacted").toString
    val n = graft.etl.Compactor.compactParquet(spark, small, out,
      targetFileMB = 1, sortCols = Seq("l_orderkey"))
    assert(partFiles(out).size == n, "must write exactly the sized file count")
    assert(n < 64 && n >= 1, s"compaction should merge files, got $n")

    // content is preserved exactly (multiset equality, both directions)
    val before = spark.read.parquet(small)
    val after = spark.read.parquet(out)
    assert(after.count() == before.count())
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)

    // range layout: each output file's l_orderkey span is disjoint — the
    // property that lets parquet row-group stats prune on the sort key
    val spans = after.select(
        org.apache.spark.sql.functions.input_file_name().as("f"), col("l_orderkey"))
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.min("l_orderkey").as("lo"),
        org.apache.spark.sql.functions.max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file key ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }
}
