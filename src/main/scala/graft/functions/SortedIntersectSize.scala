package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** |A ∩ B| for two SORTED, DISTINCT arrays via a two-pointer merge — no
  * per-row hash-set allocation, unlike the built-in `array_intersect`,
  * which makes it ~an order of magnitude cheaper in the inner loop of
  * LSH near-dup verification (millions of candidate pairs). Codegen'd.
  *
  * Element types: `array<string>` and `array<bigint>` — the long variant
  * exists so verification can run over xxhash64'd tokens (8 bytes/element
  * through the candidate-pair shuffle instead of a full UTF8 token; the
  * intersection SIZE is invariant under any collision-free identity map,
  * so a string-based oracle still matches exactly).
  *
  * Contract: both inputs ascending-sorted (`array_sort`) with no duplicate
  * or null elements; the result is a plain count, so any correct
  * intersection implementation (e.g. DuckDB's `list_intersect` in the
  * oracle) yields the same number.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private lazy val longElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case ArrayType(StringType, _) => false
    case t => throw new IllegalArgumentException(
      s"sorted_intersect_size: unsupported input type $t " +
        "(expected array<string> or array<bigint>)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c =
        if (longElems) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
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
      val cmp =
        if (longElems) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
        int $i = 0; int $j = 0; int $n = 0;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          int $c = $cmp;
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
