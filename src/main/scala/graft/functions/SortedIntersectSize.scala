package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** |A ∩ B| for two SORTED, DISTINCT string arrays via a two-pointer merge —
  * no per-row hash-set allocation, unlike the built-in `array_intersect`,
  * which makes it ~an order of magnitude cheaper in the inner loop of
  * LSH near-dup verification (millions of candidate pairs). Codegen'd.
  *
  * Contract: both inputs ascending-sorted (`array_sort`) with no duplicate
  * or null elements; the result is a plain count, so any correct
  * intersection implementation (e.g. DuckDB's `list_intersect` in the
  * oracle) yields the same number.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
        int $i = 0; int $j = 0; int $n = 0;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
          if ($c == 0) { $n++; $i++; $j++; }
          else if ($c < 0) { $i++; } else { $j++; }
        }
        ${ev.value} = $n;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size", exprs => SortedIntersectSize(exprs(0), exprs(1)),
      "built-in")
}
