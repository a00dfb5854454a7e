package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{DotProductExpr, RewriteDotProduct, Similarity}

/** Contract pins for the native dot product and its optimizer rewrite:
  * the rule may only fire where the result is BIT-identical to the
  * higher-order `aggregate(zip_with(...))` formulation — including the
  * null/ragged/empty edge semantics the HOF gets from null poisoning. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def native(a: Column, b: Column): Column = {
    DotProductExpr.register(spark)
    call_function("dot_product", a, b)
  }

  test("native == HOF on regular, ragged, null-element, and empty inputs") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),   // 32.0
      (2L, Seq(0.5f, -2.5f), Seq(4.0f, 2.0f)),              // -3.0
      (3L, Seq.empty[Float], Seq.empty[Float]),             // 0.0 (seed)
      (4L, Seq(1.0f), Seq(1.0f, 2.0f))                      // ragged → null
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("hof"),
      native(col("a"), col("b")).as("nat")).orderBy("id").collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch at id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"bit mismatch at id=${r.getLong(0)}")
    }
    // null ELEMENT poisons both the same way (build via sql to get null lanes)
    val withNull = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS a, array(1.0D, 2.0D, 3.0D) AS b")
    val r2 = withNull.select(
      Similarity.dot(col("a"), col("b")).as("hof"),
      native(col("a"), col("b")).as("nat")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1), "null element must poison both")
  }

  test("rewrite rule turns Similarity.dot into dot_product in the optimized plan") {
    val exp = spark.experimental
    val had = exp.extraOptimizations.contains(RewriteDotProduct)
    if (!had) exp.extraOptimizations = exp.extraOptimizations :+ RewriteDotProduct
    try {
      // parquet-backed input: a literal frame constant-folds to a
      // LocalRelation before the plan can be inspected
      val df = Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          Similarity.dot(col("embedding"), col("embedding")).as("d"),
          Similarity.norm(col("embedding")).as("n"))
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(plan.contains("dot_product"),
        s"expected native dot_product in optimized plan:\n$plan")
      // values bit-equal to the HOF computed WITHOUT the rule
      val got = df.orderBy("vec_id").limit(5).collect()
      exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == RewriteDotProduct)
      val ref = Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          Similarity.dot(col("embedding"), col("embedding")).as("d"),
          Similarity.norm(col("embedding")).as("n"))
        .orderBy("vec_id").limit(5).collect()
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteDotProduct
      got.zip(ref).foreach { case (g, r) =>
        assert(java.lang.Double.doubleToLongBits(g.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
        assert(java.lang.Double.doubleToLongBits(g.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)))
      }
    } finally if (!had)
      exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == RewriteDotProduct)
  }

  test("rule leaves non-dot aggregate/zip_with shapes alone") {
    val exp = spark.experimental
    val had = exp.extraOptimizations.contains(RewriteDotProduct)
    if (!had) exp.extraOptimizations = exp.extraOptimizations :+ RewriteDotProduct
    try {
      // subtraction zip (q_emb_residual's resid) and a max-abs fold
      // (q_emb_quantize's scale) must NOT rewrite
      val df = Seq((1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("id", "a", "b")
        .select(
          zip_with(col("a"), col("b"), (x, y) => x - y).as("sub"),
          aggregate(col("a"), lit(0.0),
            (acc, x) => greatest(acc, abs(x.cast("double")))).as("maxabs"))
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(!plan.contains("dot_product"), s"over-eager rewrite:\n$plan")
      val r = df.head()
      assert(r.getSeq[Float](0) == Seq(-2.0f, -2.0f))
      assert(r.getDouble(1) == 2.0)
    } finally if (!had)
      exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == RewriteDotProduct)
  }
}
