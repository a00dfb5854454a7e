package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` (the platform intrinsic) instead
  * of Spark's built-in `log`, which routes through `StrictMath.log`
  * (fdlibm). Modern libms — glibc, and DuckDB on top of it — produce the
  * correctly-rounded result, which `Math.log` matches and `StrictMath`
  * misses by 1-2 ulp on some inputs; using the intrinsic keeps
  * log-derived scores (e.g. TF-IDF) bit-identical to the DuckDB oracle.
  * Trade-off vs Spark's choice: `StrictMath` is reproducible across
  * JVMs/platforms; `Math.log` is reproducible across ENGINES on the
  * platforms this engine targets — document which you need.
  */
case class LnIeee(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ln_ieee expects DOUBLE, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    java.lang.Math.log(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): LnIeee =
    copy(child = newChild)
}

object LnIeee {
  /** Register `ln_ieee(x)` in the session's function registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ln_ieee", exprs => LnIeee(exprs.head), "built-in")
}
