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

  test("joins on the partition column get dynamic partition pruning") {
    // The 100 TB star-join contract: when the partition key is only
    // constrained THROUGH a dimension join (no literal predicate on the
    // fact), Catalyst must inject a dynamicpruning subquery so the scan
    // still prunes at file-listing time — a fact scan that reads every
    // partition because the filter sits on the dim side is exactly the
    // plan that dies at scale.
    val dir = java.nio.file.Files.createTempDirectory("evdpp").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim must be a real source (a LocalRelation folds its filter away
    // and leaves no selective predicate for the PartitionPruning rule)
    val dimDir = java.nio.file.Files.createTempDirectory("evdim").toString
    spark.createDataFrame(Seq(
        ("click", 1), ("view", 2), ("purchase", 3), ("error", 4)))
      .toDF("event_type", "type_id")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
      .filter(col("type_id") === 1) // selective filter on the DIM only
    val joined = fact.join(dim, "event_type")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scansOf(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      }.flatten
    val scans = scansOf(joined.queryExecution.executedPlan)
    val factScan = scans.find(_.metadata("Location").contains("evdpp")).get
    assert(factScan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"expected a dynamicpruning partition filter, got ${factScan.partitionFilters}")
    // and the pruned result equals the literal-predicate plan
    val expected = fact.filter(col("event_type") === "click").count()
    assert(joined.count() == expected)
  }
}
