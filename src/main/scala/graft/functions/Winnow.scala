package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03: "Winnowing: Local Algorithms for Document
  * Fingerprinting") as pure ARRAY expressions — k=8 char-gram hashes,
  * window w=4, rightmost-minimum selection via the packed-key trick
  * (`h·2048 + (2047 − pos)`: BIGINT MIN is exactly (min hash, max
  * pos)).
  *
  * Every intermediate of the selection — the per-position hash array,
  * the per-window mins, the pos-dedup — lives INSIDE one row, so the
  * whole chain is map-only: no explode, no shuffle, nothing leaves
  * the partition until a consumer aggregates the per-doc result.
  * The earlier exploded formulation pushed ~4 window-rows per k-gram
  * (≈20M rows at sf0.1) through TWO hash exchanges; this shape does
  * the identical O(n·w) work in-register. At 100 TB that's the
  * difference between a fingerprint pass that rides the document scan
  * and one that doubles the corpus through the shuffle tier.
  *
  * Shared by q_text_winnowing (per-doc fingerprint stats) and
  * q_dedup_winnowing (MOSS-style pair detection).
  */
object Winnow {
  val K = 8
  val W = 4

  /** Input columns: `txt` (capped text), `n` (= length−K+1, ≥ W).
    * Adds `sel`: the winnowed packed keys, pos-distinct, one array
    * per document.
    *
    * INVARIANT (enforced, fails loudly): n ≤ 2040, i.e. the caller
    * caps `txt` at ≤ 2047 chars. The packed key `h·2048 + (2047 −
    * pos)` encodes the position in 11 bits; a longer text would give
    * pos > 2047 a NEGATIVE offset that collides across adjacent hash
    * values and silently corrupts rightmost-min selection on both
    * engines. Current callers cap at 1024 chars; the per-row
    * `assert_true` below is one integer compare riding the same
    * projection.
    *
    * `size(keys)` instead of `n` in the window sequence is load-
    * bearing: it makes `keys` referenced twice, which stops
    * CollapseProject from inlining the O(n)-hash array into the
    * per-window lambda — that inlining would re-hash the whole
    * document for EVERY window (O(n²) md5). Pinned in PlanSpec.
    */
  def withSel(df: DataFrame): DataFrame =
    df.withColumn("n", expr(
        "n + ifnull(assert_true(n <= 2040, " +
        "'Winnow.withSel: packed key requires pos <= 2047 — cap txt at <= 2047 chars'), 0)"))
      .withColumn("keys", expr(
        s"transform(sequence(1, n), pos -> " +
        s"cast(conv(substring(md5(cast(substring(txt, pos, $K) as binary)), 1, 8), 16, 10) as bigint)" +
        s" * 2048 + (2047 - pos))"))
      .withColumn("sel", expr(
        s"array_distinct(transform(sequence(1, size(keys) - ${W - 1}), " +
        s"t -> array_min(slice(keys, t, $W))))"))
      .drop("keys")

  /** DuckDB mirror: two CTE bodies producing (doc_id, n, sel) from a
    * CTE exposing (doc_id, txt, n). Splice as
    * `s"...${Winnow.selSqlCtes("d1")}..."`. */
  def selSqlCtes(from: String): String =
    s"""ks AS (
       |  SELECT doc_id, n,
       |    list_transform(range(1, n + 1), pos ->
       |      ('0x' || substring(md5(substr(txt, pos, $K)), 1, 8))::BIGINT
       |        * 2048 + (2047 - pos)) AS keys
       |  FROM $from),
       |fp AS (
       |  SELECT doc_id, n,
       |    list_distinct(list_transform(range(1, n - ${W - 2}),
       |      t -> list_min(keys[t:t+${W - 1}]))) AS sel
       |  FROM ks)""".stripMargin
}
