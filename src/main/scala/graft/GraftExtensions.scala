package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimExpr, DotProductExpr, LnIeee, RewriteDotProduct, SlidingWindows, SortedIntersectSize}

/** Session extensions registering the engine's native Catalyst expressions
  * as SQL functions — the official injection point
  * (`spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), so the
  * functions exist from session start on every executor-launching entry
  * point (Verify, Bench, spark-submit). Query code also registers them
  * idempotently for sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator extension (ladder step c): native as-of join
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL-frontend extension: QUALIFY desugar (Spark 4.1's grammar has
    // no QUALIFY; the wrapper only fires on statements the default
    // parser REJECTS that carry a top-level QUALIFY — see GraftSqlParser)
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // analyzer-rule rung: MERGE INTO over plain relations/temp views
    // resolves to its read-side post-merge preview (see MergePreviewRule
    // — this engine's storage is parquet+JDBC, not a row-level catalog)
    e.injectResolutionRule(_ => graft.plans.MergePreviewRule)
    // optimizer-rule rung: every Similarity.dot HOF pattern in any plan
    // goes native (bit-identical — see RewriteDotProduct's contract)
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductExpr(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimExpr(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("ln_ieee"),
      new ExpressionInfo(classOf[LnIeee].getName, "ln_ieee"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LnIeee(exprs.head)))
    // generator (UDTF) rung: native sliding shingle/chunk windows —
    // row expansion without the posexplode-side all-windows array
    e.injectFunction((
      new FunctionIdentifier("sliding_windows"),
      new ExpressionInfo(classOf[SlidingWindows].getName, "sliding_windows"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SlidingWindows.build(exprs)))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectSize(exprs(0), exprs(1))))
  }
}
