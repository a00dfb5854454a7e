package graft

import org.apache.spark.sql.functions._

/** The engine is fully usable through `spark.sql` (a frontend the
  * reference lacks entirely — SURVEY §2.A "explicitly absent"): temp views
  * over the corpus + ANSI SQL, including the injected native functions. */
class SqlFrontendSpec extends SparkSpec {

  test("TPC-H-Q1-shaped SQL over temp views equals the DataFrame plan") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_v")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
         FROM lineitem_v GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect().toSeq
    val viaDf = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    assert(viaSql == viaDf)
  }

  test("native cosine_sim is callable from SQL after registration") {
    graft.functions.CosineSimExpr.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS s").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
