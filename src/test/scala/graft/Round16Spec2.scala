package graft

import org.apache.spark.sql.functions._

/** Round-16 pins for the writable-catalog surface: MERGE-execute
  * commits the preview, and a strict-cardinality violation aborts
  * BEFORE the table is touched (the executeInto ordering contract). */
class Round16Spec2 extends SparkSpec {
  import spark.implicits._

  test("MERGE-execute commits the preview; strict guard aborts pre-write") {
    // drop table AND stale warehouse location (ephemeral catalog,
    // persistent warehouse dir — the Round16Ops3.dropManaged rationale)
    spark.sql("DROP TABLE IF EXISTS q16s_tgt")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("q16s_tgt")))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.saveAsTable("q16s_tgt")
    Seq((2L, 5L), (3L, 30L)).toDF("k", "v")
      .createOrReplaceTempView("q16s_src")

    graft.ops.Merge.executeInto(spark, """
      MERGE INTO q16s_tgt t USING q16s_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v + s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""",
      "q16s_tgt")
    val after = spark.table("q16s_tgt").as[(Long, Long)].collect().toMap
    assert(after == Map(1L -> 10L, 2L -> 25L, 3L -> 30L), s"got $after")

    // duplicate-key source + strict cardinality: the guard must raise
    // during preview materialization, and the table must be UNCHANGED
    Seq((2L, 1L), (2L, 2L)).toDF("k", "v")
      .createOrReplaceTempView("q16s_dup")
    spark.conf.set("spark.sql.graft.merge.strictCardinality", "true")
    try {
      val e = intercept[Exception] {
        graft.ops.Merge.executeInto(spark, """
          MERGE INTO q16s_tgt t USING q16s_dup s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = t.v + s.v""",
          "q16s_tgt")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("GRAFT_MERGE_CARDINALITY")),
        s"expected the cardinality guard, got: ${msgs(e).mkString(" | ")}")
    } finally spark.conf.unset("spark.sql.graft.merge.strictCardinality")
    val unchanged = spark.table("q16s_tgt").as[(Long, Long)].collect().toMap
    assert(unchanged == after, "failed merge mutated the target table")
  }
}
