package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-15 batch 1 contracts: strict-cardinality MERGE (the r14
  * preview's documented duplicate-match divergence now raises like real
  * MERGE engines when `spark.sql.graft.merge.strictCardinality` is on)
  * and bag-semantics pins for the SQL EXCEPT ALL / INTERSECT ALL
  * grammar queries the DuckDB oracle cross-checks at the gate.
  */
class Round15Spec extends SparkSpec {

  private def withStrict[T](body: => T): T = {
    spark.conf.set("spark.sql.graft.merge.strictCardinality", "true")
    try body
    finally spark.conf.unset("spark.sql.graft.merge.strictCardinality")
  }

  private def mkDupViews(): Unit = {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .createOrReplaceTempView("mps_tgt")
    Seq((1L, 100L), (1L, 200L), (3L, 300L)).toDF("k", "v")
      .createOrReplaceTempView("mps_src")
  }

  test("strict MERGE: duplicate source matches raise GRAFT_MERGE_CARDINALITY") {
    mkDupViews()
    val e = intercept[Exception] {
      withStrict {
        spark.sql("""
          MERGE INTO mps_tgt t USING mps_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
          .collect()
      }
    }
    // the raise may be wrapped in SparkException layers — match the text
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("GRAFT_MERGE_CARDINALITY")),
      s"expected the cardinality error, got: $e")
  }

  test("strict MERGE: cardinality is checked on the ON clause, not the WHEN condition") {
    // both source rows match k=1 but neither passes the UPDATE
    // condition — ANSI MERGE still fails (the violation is the join
    // multiplicity, not the action), and so must the guard
    mkDupViews()
    val e = intercept[Exception] {
      withStrict {
        spark.sql("""
          MERGE INTO mps_tgt t USING mps_src s ON t.k = s.k
          WHEN MATCHED AND s.v > 1000 THEN UPDATE SET v = s.v""")
          .collect()
      }
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("GRAFT_MERGE_CARDINALITY")),
      s"expected the cardinality error, got: $e")
  }

  test("strict MERGE: clean input passes the guard and matches the default path") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .createOrReplaceTempView("mps_tgt_ok")
    Seq((2L, 200L), (4L, 400L)).toDF("k", "v")
      .createOrReplaceTempView("mps_src_ok")
    val stmt = """
      MERGE INTO mps_tgt_ok t USING mps_src_ok s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v + s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
    val strictRows = withStrict { spark.sql(stmt).orderBy("k").collect().toSeq }
    val defaultRows = spark.sql(stmt).orderBy("k").collect().toSeq
    assert(strictRows == defaultRows)
    assert(strictRows == Seq(Row(1L, 10L), Row(2L, 220L), Row(3L, 30L), Row(4L, 400L)))
  }

  test("strict MERGE: unmatched target rows (multiplicity 1 via NULL row) pass") {
    import spark.implicits._
    // a target row with NO match still contributes exactly one joined
    // row — the guard must count it as 1, not flag or drop it
    Seq((9L, 90L)).toDF("k", "v").createOrReplaceTempView("mps_tgt_um")
    Seq((1L, 100L)).toDF("k", "v").createOrReplaceTempView("mps_src_um")
    val got = withStrict {
      spark.sql("""
        MERGE INTO mps_tgt_um t USING mps_src_um s ON t.k = s.k
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
        .orderBy("k").collect().toSeq
    }
    assert(got == Seq(Row(1L, 100L), Row(9L, 90L)))
  }

  test("q_sql_exceptall / q_sql_intersectall match direct bag arithmetic") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").cast("long").as("k"),
        year(col("o_orderdate")).as("y"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    def mult(y: Int): Map[Long, Int] =
      o.filter(_._2 == y).groupBy(_._1).view.mapValues(_.length).toMap
    val (m95, m96, m97, m98) = (mult(1995), mult(1996), mult(1997), mult(1998))
    val expEx = m95.map { case (k, m) => k -> (m - m96.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    val expIn = m97.flatMap { case (k, m) =>
      val x = math.min(m, m98.getOrElse(k, 0)); if (x > 0) Some(k -> x) else None
    }
    val gotEx = SparkEntry.queries("q_sql_exceptall")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val gotIn = SparkEntry.queries("q_sql_intersectall")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(gotEx == expEx, "EXCEPT ALL bag multiplicities")
    assert(gotIn == expIn, "INTERSECT ALL bag multiplicities")
    assert(gotEx.nonEmpty && gotIn.nonEmpty, "bag pins must not be vacuous")
  }
}
