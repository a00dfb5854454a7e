package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding-window GENERATOR — the UDTF rung of the extension
  * ladder (the repo already has custom scalar Expressions, a UDAF, a
  * logical node + Strategy, a parser and analyzer/optimizer rules; this
  * is the row-EXPANSION rung). `sliding_windows(words, size, stride,
  * partial)` emits one (pos, win) row per window over an array<string>
  * of tokens, where `win` is the window's tokens joined by a single
  * space and `pos` is the 0-based window index.
  *
  *   - partial = false: full windows only — starts 1, 1+stride, … while
  *     start+size-1 ≤ n; ZERO rows when n < size (the ExactSubstr
  *     stride-1 shingle contract of q_dedup_substring).
  *   - partial = true: window count = 1 + ceil(max(n−size,0)/stride),
  *     the last window clamped to the array end; every doc emits ≥ 1
  *     window (the embedding-chunker contract of q_text_chunks).
  *
  * Why native instead of the posexplode ∘ transform ∘ sequence ∘ slice
  * composition the queries previously compiled to: that shape first
  * MATERIALIZES the whole window array per row — for a W-token window
  * over an n-token doc, n·W token copies live simultaneously in one
  * array cell (~8× the document text for the stride-1 W=8 shingler)
  * before the explode streams them out. The generator emits windows one
  * at a time from a lazy iterator; peak per-row allocation drops from
  * O(n·W) to O(W), which is the difference between a projection that
  * spills and one that doesn't on long documents. Window CONTENT is
  * byte-identical (same join separator, same clamping), so every
  * downstream hash — and the DuckDB oracles — are unchanged; the gate
  * re-proves it. Generators run outside whole-stage codegen by design
  * (GenerateExec), exactly like the built-in explode family at this
  * fan-out; PlanSpec pins the fused GenerateExec shape.
  *
  * size/stride/partial must be foldable (they parameterize the operator,
  * not the data) — enforced at type-check so misuse fails at analysis.
  */
case class SlidingWindows(
    child: Expression,
    size: Expression,
    stride: Expression,
    partial: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, size, stride, partial)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("win", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    // Parameters are foldable, so their VALUES are checkable here too:
    // a foldable NULL (CAST(NULL AS INT) folds) or a non-positive
    // size/stride must be an ANALYSIS error, not a confusing per-row
    // unboxing of null to 0/false at eval time (round-16 ADVICE).
    if (child.dataType != ArrayType(StringType, containsNull = false) &&
        child.dataType != ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"sliding_windows: first argument must be array<string>, got ${child.dataType}")
    else if (size.dataType != IntegerType || !size.foldable)
      TypeCheckResult.TypeCheckFailure("sliding_windows: size must be a foldable INT")
    else if (stride.dataType != IntegerType || !stride.foldable)
      TypeCheckResult.TypeCheckFailure("sliding_windows: stride must be a foldable INT")
    else if (partial.dataType != BooleanType || !partial.foldable)
      TypeCheckResult.TypeCheckFailure("sliding_windows: partial must be a foldable BOOLEAN")
    else if (size.eval(null) == null || stride.eval(null) == null ||
        partial.eval(null) == null)
      TypeCheckResult.TypeCheckFailure(
        "sliding_windows: size/stride/partial must not be NULL")
    else if (size.eval(null).asInstanceOf[Int] < 1 ||
        stride.eval(null).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        "sliding_windows: size and stride must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val sz: Int = size.eval(null).asInstanceOf[Int]
  @transient private lazy val st: Int = stride.eval(null).asInstanceOf[Int]
  @transient private lazy val emitPartial: Boolean =
    partial.eval(null).asInstanceOf[Boolean]
  @transient private lazy val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    require(sz >= 1 && st >= 1, "sliding_windows: size and stride must be >= 1")
    val nWins =
      if (emitPartial) 1 + (math.max(n - sz, 0) + st - 1) / st
      else if (n < sz) 0
      else (n - sz) / st + 1
    new Iterator[InternalRow] {
      private var k = 0
      override def hasNext: Boolean = k < nWins
      override def next(): InternalRow = {
        val start = k * st            // 0-based first token of window k
        val len = math.min(sz, n - start)
        // null tokens are SKIPPED, exactly like concat_ws(" ", slice(…))
        // (split() never yields nulls, but the contract must match the
        // composition it replaces even on containsNull inputs)
        val toks = new scala.collection.mutable.ArrayBuffer[UTF8String](len)
        var i = 0
        while (i < len) {
          val t = arr.getUTF8String(start + i)
          if (t != null) toks += t
          i += 1
        }
        val row = new GenericInternalRow(2)
        row.update(0, k)
        row.update(1, UTF8String.concatWs(space, toks.toSeq: _*))
        k += 1
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), size = newChildren(1),
      stride = newChildren(2), partial = newChildren(3))
}

object SlidingWindows {
  /** Arity-checked constructor for the registration lambdas — a wrong
    * argument count must fail analysis with the function's own message,
    * not an IndexOutOfBoundsException from `exprs(3)` (round-16 ADVICE;
    * both registration sites — here and GraftExtensions — go through
    * this). */
  def build(exprs: Seq[Expression]): SlidingWindows = {
    if (exprs.length != 4)
      throw new IllegalArgumentException(
        "sliding_windows expects exactly 4 arguments " +
          s"(tokens array<string>, size INT, stride INT, partial BOOLEAN); got ${exprs.length}")
    SlidingWindows(exprs(0), exprs(1), exprs(2), exprs(3))
  }

  /** Idempotent session registration for sessions built without
    * [[graft.GraftExtensions]] (the CosineSimExpr pattern). */
  def register(s: SparkSession): Unit =
    if (!s.catalog.functionExists("sliding_windows"))
      s.sessionState.functionRegistry.registerFunction(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("sliding_windows"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SlidingWindows].getName, "sliding_windows"),
        (exprs: Seq[Expression]) => build(exprs))
}
