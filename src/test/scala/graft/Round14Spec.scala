package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-14 batch 1 contracts: the MERGE-INTO preview resolution rule
  * ([[graft.plans.MergePreviewRule]]) — action coverage, conditional
  * actions, the duplicate-source cardinality precondition, and the
  * unsupported-shape passthrough — plus the SQL UNPIVOT label contract.
  * The cross-engine value check for q_sql_merge / q_sql_unpivot is the
  * DuckDB oracle; these pins cover the shapes the one registered query
  * does not exercise.
  */
class Round14Spec extends SparkSpec {

  private def mkViews(): Unit = {
    import spark.implicits._
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "tag").createOrReplaceTempView("mp_tgt")
    Seq((2L, 200L), (4L, 400L))
      .toDF("k", "v").createOrReplaceTempView("mp_src")
  }

  test("MERGE preview: update + insert (the canonical upsert)") {
    mkViews()
    val got = spark.sql("""
      MERGE INTO mp_tgt t USING mp_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v + s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      .orderBy("k").collect().toSeq
    assert(got == Seq(
      Row(1L, 10L, "a"),
      Row(2L, 220L, "b"),          // matched: updated
      Row(3L, 30L, "c"),
      Row(4L, 400L, null)))        // inserted: unassigned tag → NULL
  }

  test("MERGE preview: conditional UPDATE applies only where the extra predicate holds") {
    mkViews()
    val got = spark.sql("""
      MERGE INTO mp_tgt t USING mp_src s ON t.k = s.k
      WHEN MATCHED AND s.v > 1000 THEN UPDATE SET v = s.v""")
      .orderBy("k").collect().toSeq
    // k=2 matches but s.v=200 fails the condition → row unchanged;
    // no insert action → source-only k=4 does not appear
    assert(got == Seq(Row(1L, 10L, "a"), Row(2L, 20L, "b"), Row(3L, 30L, "c")))
  }

  test("MERGE preview: WHEN MATCHED THEN DELETE removes matched rows only") {
    mkViews()
    val got = spark.sql("""
      MERGE INTO mp_tgt t USING mp_src s ON t.k = s.k
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      .orderBy("k").collect().toSeq
    assert(got == Seq(Row(1L, 10L, "a"), Row(3L, 30L, "c"), Row(4L, 400L, null)))
  }

  test("MERGE preview: insert-only merge keeps every target row unchanged") {
    mkViews()
    val got = spark.sql("""
      MERGE INTO mp_tgt t USING mp_src s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v * 2)""")
      .orderBy("k").collect().toSeq
    assert(got == Seq(
      Row(1L, 10L, "a"), Row(2L, 20L, "b"), Row(3L, 30L, "c"),
      Row(4L, 800L, null)))
  }

  test("MERGE preview: conditional INSERT filters the anti-join branch") {
    mkViews()
    val got = spark.sql("""
      MERGE INTO mp_tgt t USING mp_src s ON t.k = s.k
      WHEN NOT MATCHED AND s.v < 100 THEN INSERT (k, v) VALUES (s.k, s.v)""")
      .orderBy("k").collect().toSeq
    // k=4 is unmatched but s.v=400 fails the insert condition
    assert(got == Seq(Row(1L, 10L, "a"), Row(2L, 20L, "b"), Row(3L, 30L, "c")))
  }

  test("MERGE preview: duplicate source matches duplicate the target row (documented precondition)") {
    import spark.implicits._
    Seq((1L, 10L)).toDF("k", "v").createOrReplaceTempView("mp_tgt_dup")
    Seq((1L, 100L), (1L, 200L)).toDF("k", "v")
      .createOrReplaceTempView("mp_src_dup")
    val got = spark.sql("""
      MERGE INTO mp_tgt_dup t USING mp_src_dup s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
      .orderBy("v").collect().toSeq
    // real MERGE throws on multi-match; the READ-side preview shows one
    // row per match — the precondition (source unique on merge keys) is
    // the caller's, exactly as in every MERGE engine
    assert(got == Seq(Row(1L, 100L), Row(1L, 200L)))
  }

  test("MERGE preview: unsupported shapes pass through to Spark's own error") {
    mkViews()
    // two matched actions — outside the supported subset; the rule must
    // leave the command standing so Spark rejects it (temp views carry
    // no row-level-operation catalog), not silently half-rewrite
    val e = intercept[Exception](spark.sql("""
      MERGE INTO mp_tgt t USING mp_src s ON t.k = s.k
      WHEN MATCHED AND s.v > 150 THEN UPDATE SET v = s.v
      WHEN MATCHED THEN DELETE""").collect())
    assert(e.getMessage != null)
  }

  test("SQL UNPIVOT emits source column names as labels, matching the oracle's casing") {
    import spark.implicits._
    Seq((1L, 2L, 3L)).toDF("id", "m_one", "m_two")
      .createOrReplaceTempView("up_q14")
    val got = spark.sql("""
      SELECT id, metric, val FROM up_q14
      UNPIVOT (val FOR metric IN (m_one, m_two)) ORDER BY metric""")
      .collect().toSeq
    assert(got == Seq(Row(1L, "m_one", 2L), Row(1L, "m_two", 3L)))
  }
}
