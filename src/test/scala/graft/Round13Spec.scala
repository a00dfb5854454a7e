package graft

import org.apache.spark.sql.functions._

/** Round-13 batch 1 contracts: the QUALIFY parser extension (desugar
  * unit pins + an end-to-end `spark.sql` run through the injected
  * parser), SQL PIVOT vs its DataFrame twin, and Krippendorff's alpha
  * pinned against the textbook coincidence-matrix computation on
  * collected data. */
class Round13Spec extends SparkSpec {

  import graft.plans.GraftSqlParser.desugarQualify

  // ---- QUALIFY desugar: pure-function pins --------------------------

  test("desugarQualify rewrites the simple clause") {
    val out = desugarQualify(
      "SELECT a, rank() OVER (ORDER BY b) AS r FROM t QUALIFY r <= 2 ORDER BY a")
      .map(_.replaceAll("\\s+", " "))
    assert(out.contains(
      "SELECT * FROM ( SELECT a, rank() OVER (ORDER BY b) AS r FROM t ) __qualify__ WHERE r <= 2 ORDER BY a"))
  }

  test("desugarQualify keeps LIMIT after the predicate") {
    val out = desugarQualify("SELECT a, r FROM t QUALIFY r = 1 LIMIT 5").get
    assert(out.endsWith("WHERE r = 1 LIMIT 5"))
  }

  test("desugarQualify ignores quoted and nested occurrences") {
    assert(desugarQualify("SELECT 'QUALIFY' AS s FROM t").isEmpty)
    assert(desugarQualify("SELECT `QUALIFY` FROM t").isEmpty)
    // QUALIFY inside a subquery is depth>0: the top level has none
    assert(desugarQualify(
      "SELECT * FROM (SELECT a, r FROM t QUALIFY r = 1) u").isEmpty)
    assert(desugarQualify("SELECT a FROM t -- QUALIFY r = 1").isEmpty)
    assert(desugarQualify("SELECT a FROM t /* QUALIFY r = 1 */").isEmpty)
  }

  test("desugarQualify declines multi-QUALIFY and empty predicates") {
    assert(desugarQualify("SELECT a FROM t QUALIFY r = 1 QUALIFY r = 2").isEmpty)
    assert(desugarQualify("SELECT a FROM t QUALIFY ").isEmpty)
  }

  test("desugarQualify declines top-level set operations and distribution clauses") {
    // r14 / ADVICE r13: under a set operation the wrap cannot know which
    // block the QUALIFY binds to (a second-branch QUALIFY would become a
    // filter over the whole union), so the boundary is enforced
    // EXPLICITLY — decline, original error rethrown — not by hoping the
    // re-parse fails.
    assert(desugarQualify(
      "SELECT a, r FROM t QUALIFY r = 1 UNION ALL SELECT a, r FROM u").isEmpty)
    assert(desugarQualify(
      "SELECT a, 1 AS r FROM t UNION SELECT a, r FROM u QUALIFY r = 1").isEmpty)
    assert(desugarQualify(
      "SELECT a FROM t INTERSECT SELECT a, r FROM u QUALIFY r = 1").isEmpty)
    assert(desugarQualify(
      "SELECT a, r FROM t QUALIFY r = 1 DISTRIBUTE BY a").isEmpty)
    assert(desugarQualify(
      "SELECT a, r FROM t QUALIFY r = 1 SORT BY a").isEmpty)
    assert(desugarQualify(
      "SELECT a, r FROM t QUALIFY r = 1 CLUSTER BY a").isEmpty)
    // parenthesized set operands are depth > 0: still in scope
    assert(desugarQualify(
      "SELECT a, r FROM (SELECT a FROM t UNION ALL SELECT a FROM u) z QUALIFY r = 1").nonEmpty)
  }

  test("spark.sql rethrows the original error for QUALIFY + set operation / DISTRIBUTE BY") {
    import org.apache.spark.sql.catalyst.parser.ParseException
    spark.read.parquet(s"$sf/customer.parquet")
      .createOrReplaceTempView("cust_q13neg")
    val e1 = intercept[ParseException](spark.sql(
      """SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rn
         FROM cust_q13neg QUALIFY rn <= 2
         UNION ALL SELECT c_custkey, CAST(1 AS BIGINT) FROM cust_q13neg""").collect())
    assert(e1.getMessage.toUpperCase(java.util.Locale.ROOT).contains("QUALIFY"))
    val e2 = intercept[ParseException](spark.sql(
      """SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rn
         FROM cust_q13neg QUALIFY rn <= 2 DISTRIBUTE BY c_custkey""").collect())
    assert(e2.getMessage.toUpperCase(java.util.Locale.ROOT).contains("QUALIFY"))
  }

  // ---- QUALIFY end-to-end through the injected parser ---------------

  test("spark.sql accepts QUALIFY via GraftSqlParser and matches the window-subquery form") {
    spark.read.parquet(s"$sf/customer.parquet")
      .createOrReplaceTempView("cust_q13spec")
    val qualified = spark.sql("""
      SELECT c_nationkey, c_custkey,
             row_number() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM cust_q13spec
      QUALIFY rn <= 2
      ORDER BY c_nationkey, rn""")
    val manual = spark.sql("""
      SELECT * FROM (
        SELECT c_nationkey, c_custkey,
               row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM cust_q13spec) WHERE rn <= 2
      ORDER BY c_nationkey, rn""")
    assert(qualified.collect().toSeq == manual.collect().toSeq)
    assert(qualified.count() > 0)
  }

  test("a statement Spark already accepts is never touched (valid SQL with 'qualify' as an alias)") {
    // `qualify` is not a reserved word in Spark: usable as a column alias;
    // the wrapper must not fire because the default parse SUCCEEDS
    val df = spark.sql("SELECT 1 AS qualify")
    assert(df.collect().head.getInt(0) == 1)
  }

  // ---- SQL PIVOT vs the DataFrame twin -------------------------------

  test("q_sql_pivot equals the DataFrame pivot twin") {
    val got = SparkEntry.queries("q_sql_pivot")(spark, sf)
    val twin = spark.read.parquet(s"$sf/orders.parquet")
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderstatus").as("st"),
        col("o_totalprice").cast("decimal(18,2)").as("tp"))
      .groupBy("yr").pivot("st", Seq("O", "F", "P")).sum("tp")
      .select(col("yr"), col("O").cast("double").as("status_o"),
        col("F").cast("double").as("status_f"),
        col("P").cast("double").as("status_p"))
      .orderBy("yr")
    assert(got.collect().toSeq == twin.collect().toSeq)
  }

  // ---- Krippendorff: closed form == coincidence matrix ---------------

  test("q_quality_krippendorff matches the textbook coincidence-matrix alpha") {
    val row = SparkEntry.queries("q_quality_krippendorff")(spark, sf)
      .collect().head
    // reference: per-unit category counts -> coincidence matrix o_ck =
    // sum_u n_uc (n_uk - d_ck) / (m_u - 1); alpha = 1 - D_o / D_e
    val labels = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        (col("n_chars") >= 300).as("a"),
        (expr("regexp_count(text, '[.!?]')") * 20 >=
          size(filter(split(col("text"), " "), x => x =!= ""))).as("b"),
        (size(filter(split(col("text"), " "), x => x =!= "")) >= 60).as("c"))
      .collect()
      .map(r => Seq(r.getBoolean(0), r.getBoolean(1), r.getBoolean(2))
        .count(identity))
    val m = 3.0
    var o11 = 0.0; var o00 = 0.0; var o01 = 0.0 // o01 counts BOTH off-diagonals
    labels.foreach { k =>
      val n1 = k.toDouble; val n0 = m - n1
      o11 += n1 * (n1 - 1) / (m - 1)
      o00 += n0 * (n0 - 1) / (m - 1)
      o01 += 2 * n1 * n0 / (m - 1)
    }
    val n1 = o11 + o01 / 2; val n0 = o00 + o01 / 2; val n = n1 + n0
    val dO = o01 / n
    val dE = 2 * n1 * n0 / (n * (n - 1))
    val alphaRef = 1.0 - dO / dE
    assert(math.abs(row.getAs[Double]("alpha") - alphaRef) < 1e-12,
      s"closed form ${row.getAs[Double]("alpha")} vs coincidence $alphaRef")
    assert(row.getAs[Long]("n_ratings") == 3 * row.getAs[Long]("n_units"))
    // the three gates genuinely disagree on some units (alpha < 1) but
    // measure a common quality notion (alpha > 0)
    val a = row.getAs[Double]("alpha")
    assert(a > 0.0 && a < 1.0, s"alpha=$a")
  }
}
