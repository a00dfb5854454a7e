package graft

import org.apache.spark.sql.functions._

import graft.plans.SqlScript

/** Round-17 pins:
  *   1. partitioned MERGE-execute rewrites ONLY the partitions the
  *      delta touches — every untouched partition's files are
  *      byte-identical across the merge (path, length, and content
  *      bytes), and the touched partitions did change;
  *   2. the SQL-script statement splitter is quote/comment/paren-safe
  *      and the MERGE router finds the right target;
  *   3. a script's MERGE actually COMMITS (the table read back after
  *      the script reflects the merge, not the pre-merge state).
  */
class Round17Spec extends SparkSpec {

  private def tableDir(name: String): java.io.File =
    new java.io.File(new java.net.URI(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).toString))

  /** (relative path → content hash) of every data file under `dir`. */
  private def snapshot(dir: java.io.File): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.startsWith("part-") || f.getName == "_SUCCESS") Seq(f)
      else Seq.empty
    walk(dir).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val h = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
        .map("%02x".format(_)).mkString
      f.getAbsolutePath.stripPrefix(dir.getAbsolutePath) -> h
    }.toMap
  }

  test("partitioned merge: untouched partitions byte-identical, touched rewritten") {
    // run the registered query once — it CTASes the partitioned target,
    // merges buckets {0,3}, and reads back; we re-create the PRE-merge
    // state here to snapshot, then merge, then compare per partition.
    Tables.orders(spark, sf).createOrReplaceTempView("orders_q17p")
    graft.queries.Round16Ops3.dropManaged(spark, "q17_merge_part_tgt")
    spark.sql("""
      CREATE TABLE q17_merge_part_tgt USING parquet PARTITIONED BY (bkt) AS
      SELECT o_custkey, count(*) AS cnt,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
             CAST(o_custkey % 8 AS BIGINT) AS bkt
      FROM orders_q17p WHERE year(o_orderdate) < 1997
      GROUP BY o_custkey""")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW q17_merge_part_src AS
      SELECT o_custkey, count(*) AS cnt,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
             CAST(o_custkey % 8 AS BIGINT) AS bkt
      FROM orders_q17p
      WHERE year(o_orderdate) >= 1997 AND o_custkey % 8 IN (0, 3)
      GROUP BY o_custkey""")
    val dir = tableDir("q17_merge_part_tgt")
    val allBuckets = (0L to 7L)
    val affected = Seq(0L, 3L)
    val before = allBuckets.map(b =>
      b -> snapshot(new java.io.File(dir, s"bkt=$b"))).toMap
    assert(before.values.forall(_.nonEmpty), "pre-merge table has empty partitions")

    graft.ops.Merge.executeIntoPartitioned(spark, """
      MERGE INTO q17_merge_part_tgt t
      USING q17_merge_part_src s
      ON t.o_custkey = s.o_custkey
      WHEN MATCHED THEN
        UPDATE SET cnt = t.cnt + s.cnt, total = t.total + s.total
      WHEN NOT MATCHED THEN INSERT (o_custkey, cnt, total, bkt)
                            VALUES (s.o_custkey, s.cnt, s.total, s.bkt)""",
      "q17_merge_part_tgt", "bkt", affected)

    val after = allBuckets.map(b =>
      b -> snapshot(new java.io.File(dir, s"bkt=$b"))).toMap
    for (b <- allBuckets if !affected.contains(b))
      assert(after(b) == before(b),
        s"untouched partition bkt=$b was rewritten by the merge")
    for (b <- affected)
      assert(after(b) != before(b),
        s"affected partition bkt=$b was NOT rewritten by the merge")

    // and the published content equals the full-rewrite semantics: the
    // read-back matches the registered query's own oracle-shaped result
    val got = spark.table("q17_merge_part_tgt")
      .groupBy("bkt").agg(count(lit(1)).as("n"), sum("cnt").as("sc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tgt = spark.sql("SELECT * FROM orders_q17p WHERE year(o_orderdate) < 1997")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    val src = spark.table("q17_merge_part_src")
    val merged = tgt.as("t").join(src.as("s"), Seq("o_custkey"), "left")
      .select(col("o_custkey"),
        (col("t.cnt") + coalesce(col("s.cnt"), lit(0L))).as("cnt"))
      .unionByName(src.join(tgt.select("o_custkey"), Seq("o_custkey"), "left_anti")
        .select(col("o_custkey"), col("cnt")))
    val exp = merged
      .groupBy((col("o_custkey") % 8).as("bkt"))
      .agg(count(lit(1)).as("n"), sum("cnt").as("sc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp, "partitioned publish diverged from merge semantics")
  }

  test("script splitter: semicolons in strings/comments/parens never split") {
    val script =
      """CREATE TABLE a AS SELECT ';' AS semi, 1 AS x; -- trailing; comment
        |/* a ; inside
        |   a block comment */
        |INSERT INTO a SELECT 'it''s;fine', (SELECT max(x) FROM a);
        |SELECT * FROM a
        |""".stripMargin
    val stmts = SqlScript.split(script)
    assert(stmts.size == 3, s"expected 3 statements, got ${stmts.size}: $stmts")
    assert(stmts(0).startsWith("CREATE TABLE a"))
    assert(stmts(1).startsWith("INSERT INTO a"))
    assert(stmts(2).startsWith("SELECT * FROM a"))
    // comment-only / empty fragments are dropped
    assert(SqlScript.split("-- nothing here\n;;  \n/* still nothing */;").isEmpty)
  }

  test("script MERGE router: finds the target through comments and aliases") {
    assert(SqlScript.mergeTarget(
      "MERGE INTO q17_script_tgt t USING s ON 1=1") == Some("q17_script_tgt"))
    assert(SqlScript.mergeTarget(
      "-- commit the delta\nMERGE INTO db.tbl AS t USING s ON 1=1") == Some("db.tbl"))
    assert(SqlScript.mergeTarget("SELECT 'MERGE INTO x'") == None)
    assert(SqlScript.mergeTarget("INSERT INTO t SELECT 1") == None)
  }

  test("script MERGE commits: read-back reflects the merged state") {
    val q = SparkEntry.queries("q_sql_script")(spark, sf)
    // the script's final SELECT filters cnt >= 2; the merged table must
    // contain keys from all three periods with summed counts
    val rows = q.collect()
    assert(rows.nonEmpty)
    // recompute one custkey's expected post-merge cnt directly
    val ordersDf = Tables.orders(spark, sf)
    val withYear = ordersDf.withColumn("y", year(col("o_orderdate")))
    val k = withYear.filter(col("y") >= 1997).select("o_custkey")
      .intersect(withYear.filter(col("y") < 1996).select("o_custkey"))
      .orderBy("o_custkey").limit(1).collect()
    assume(k.nonEmpty, "corpus has no custkey spanning both periods at this SF")
    val key = k.head.getLong(0)
    val expCnt = withYear
      .filter(col("o_custkey") === key && (col("y") < 1996 || col("y") >= 1997))
      .count()
    // the pre-1996 row absorbed the merge delta; a 1996 INSERT row for
    // the same key absorbed it too — sum across the duplicate-key rows
    val gotCnt = spark.table("q17_script_tgt")
      .filter(col("o_custkey") === key)
      .agg(sum("cnt").cast("long")).head().getLong(0)
    // each target row for `key` got s.cnt added; expected total =
    // cnt(<1996) + cnt(=1996) + dupRows * cnt(>=1997)
    val dupRows = spark.table("q17_script_tgt")
      .filter(col("o_custkey") === key).count()
    val c96 = withYear.filter(col("o_custkey") === key && col("y") === 1996).count()
    val c97 = withYear.filter(col("o_custkey") === key && col("y") >= 1997).count()
    val cPre = withYear.filter(col("o_custkey") === key && col("y") < 1996).count()
    assert(gotCnt == cPre + c96 + dupRows * c97,
      s"script merge did not commit the expected counts for custkey $key")
    assert(expCnt == cPre + c97, "sanity: recomputation disagrees")
  }
}
