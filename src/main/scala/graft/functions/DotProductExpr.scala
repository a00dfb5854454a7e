package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, BinaryExpression, Cast, Expression, LambdaFunction, Literal, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two float/double array columns — the
  * fused-loop twin of the [[Similarity.dot]] higher-order formulation
  * (`aggregate(zip_with(a, b, ·×·), 0.0, +)`), which evaluates through
  * interpreted lambda plumbing and blocks whole-stage fusion around the
  * hottest arithmetic in the similarity family.
  *
  * Math contract: BIT-IDENTICAL to the HOF version on every input —
  *   - 0.0 seed, ascending-index accumulation (the oracle fold order);
  *   - length mismatch → NULL (zip_with pads with null, null poisons
  *     the fold);
  *   - any null element → NULL (same poisoning);
  *   - empty arrays → 0.0 (the seed).
  * That equivalence is what lets [[RewriteDotProduct]] swap it in
  * underneath ALREADY-VERIFIED queries without moving a single hash.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects float/double arrays, got " +
          s"(${left.dataType}, ${right.dataType})")

  private lazy val leftFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightFloat = elemType(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX =
        if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY =
        if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += ($getX) * ($getY);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Register `dot_product(a, b)` in the session registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
}

/** Optimizer rule (extension-ladder rung between Expression and
  * Strategy): recognize the exact [[Similarity.dot]] pattern
  * `aggregate(zip_with(a, b, (x, y) → x·y), 0.0, (acc, v) → acc + v)`
  * anywhere in a plan and replace it with [[DotProductExpr]]. Every
  * already-written dot/norm/cosine in the tree goes native without
  * touching query code — and because the expression is bit-identical
  * (see contract above), the DuckDB hash gate is unaffected.
  *
  * The match is deliberately STRICT: the multiply operands must be the
  * two zip lambda variables (possibly behind double casts, either
  * order — IEEE multiply commutes bit-exactly), the merge must be
  * `acc + v` with the accumulator on the LEFT (left fold), the seed
  * must be literal +0.0 (doubleToLongBits == 0L; a -0.0 seed differs
  * on empty arrays), and the finish lambda must be identity. Anything
  * else keeps the HOF plan.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast => c.dataType == DoubleType && isBareVar(c.child, v)
    case other => isBareVar(other, v) && other.dataType == DoubleType
  }
  private def isBareVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }
  private def arrayOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(m: org.apache.spark.sql.catalyst.expressions.Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(add: org.apache.spark.sql.catalyst.expressions.Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if java.lang.Double.doubleToLongBits(zero) == 0L &&
            arrayOk(a) && arrayOk(b) &&
            ((isVar(m.left, x) && isVar(m.right, y)) ||
              (isVar(m.left, y) && isVar(m.right, x))) &&
            isBareVar(add.left, acc) && isBareVar(add.right, v) &&
            isBareVar(fin, fv) =>
        DotProductExpr(a, b)
    }
}
