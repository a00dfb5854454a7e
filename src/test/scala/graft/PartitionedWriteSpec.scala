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
}
