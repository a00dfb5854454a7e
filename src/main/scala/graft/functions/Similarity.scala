package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector similarity primitives over `ArrayType(FloatType)`
  * columns — pure Catalyst higher-order functions (codegen'd, no UDF).
  *
  * Determinism contract: the dot product is a LEFT-TO-RIGHT fold with a
  * DOUBLE accumulator (`aggregate(zip_with(...))`), which the DuckDB oracle
  * mirrors with `list_reduce(list_prepend(0.0, list_transform(...)))` —
  * bit-identical results, unlike float32-accumulating shortcuts.
  */
object Similarity {

  /** Σ aᵢ·bᵢ folded left-to-right in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; assumes non-zero vectors (synthetic embeddings are). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket code from the first `nBits` dimensions: the
    * coarse-quantization path for approximate NN — co-bucketed vectors are
    * candidate neighbors, turning an O(N·Q) scan into a bucket-equi-join
    * that Spark executes as a shuffle-free broadcast or hash join. */
  def signBucket(a: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(a, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** [[signBucket]] over dimensions [offset, offset+nBits) — the per-table
    * code for multi-table LSH, where each table hashes a DIFFERENT slice
    * of the vector so tables fail independently and recall compounds. */
  def signBucketAt(a: Column, nBits: Int, offset: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(a, offset + i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Squared L2 distance, same left-fold determinism contract as [[dot]]. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dxy = x.cast("double") - y.cast("double"); dxy * dxy
      }),
      lit(0.0), (acc, x) => acc + x)

  def l2sqSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(len($a)), i -> ($a[i+1]::DOUBLE - $b[i+1]::DOUBLE) * ($a[i+1]::DOUBLE - $b[i+1]::DOUBLE))), (acc, x) -> acc + x)"

  /** DuckDB SQL twin of [[dot]] for oracle queries ( `$a`/`$b` are list
    * expressions). */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE)), (acc, x) -> acc + x)"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  def signBucketSql(a: String, nBits: Int): String =
    (0 until nBits).map { i =>
      s"(CASE WHEN $a[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def signBucketAtSql(a: String, nBits: Int, offset: Int): String =
    (0 until nBits).map { i =>
      s"(CASE WHEN $a[${offset + i + 1}] > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
