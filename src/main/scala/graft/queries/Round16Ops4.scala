package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Round-16 stretch: CROSS-MODAL near-dup — the web-corpus image/
  * caption case. A multimodal curation pass must distinguish "this
  * image-text pair is a true duplicate of that one" (drop one) from
  * "same-ish image reused under a different caption" (keep both — they
  * are different training examples). Composition of two EXISTING
  * substrates, no new all-pairs shape:
  *
  *   - image side: the q_multimodal_phash_neardup candidate machinery —
  *     dHash over the real decoded PNGs, 4×16-bit banding, per-bucket
  *     cap 16, Hamming ≤ 6 verification (8-byte hashes shuffle, never
  *     pixels);
  *   - text side: the q_dedup_exact digest — md5(text) — joined to each
  *     pair endpoint by doc_id (co-keyed, broadcast-or-hash equi-joins).
  *
  * Verdict per image-near-dup pair: `dup_cross_modal` when the captions
  * are byte-identical (both modalities agree — the pair is one piece of
  * content), else `image_only` (visual reuse across different text).
  *
  * Scale shape: the pair frame is the capped-banded candidate set
  * (bounded by bands·cap² per bucket); the text digests attach via two
  * doc_id equi-joins against a 16-byte-digest projection of documents —
  * at the real corpus asymmetry the digest side is a fraction of the
  * image side and rides a broadcast.
  */
object Round16Ops4 {

  /** The q_multimodal_phash_neardup oracle prelude: fixture-closed-form
    * dHash + banding + cap + Hamming-verified pairs (CTE `prs`). */
  private val pairCtes: String =
    """dims AS (
      |  SELECT doc_id, (doc_id % 13 + 4)::BIGINT AS w,
      |    (doc_id % 11 + 3)::BIGINT AS h
      |  FROM documents),
      |gy AS (SELECT *, unnest(range(8)) AS y FROM dims),
      |gx AS (SELECT *, unnest(range(1, 9)) AS x FROM gy),
      |bits AS (
      |  SELECT doc_id, y, x,
      |    (((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) % 256) * 299
      |      + ((((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 13) % 256) * 587
      |      + ((((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 26) % 256) * 114
      |      AS lum1,
      |    ((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) % 256) * 299
      |      + (((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 13) % 256) * 587
      |      + (((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 26) % 256) * 114
      |      AS lum0
      |  FROM gx),
      |ph AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN lum1 > lum0 THEN
      |        CASE WHEN y * 8 + (x - 1) = 63
      |             THEN (-9223372036854775807 - 1)::BIGINT
      |             ELSE 1::BIGINT << (y * 8 + (x - 1))::INT END
      |        ELSE 0 END)::BIGINT AS phash
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, phash, b, (phash >> (b * 16)::INT) & 65535 AS k
      |  FROM ph, (SELECT unnest(range(4)) AS b)),
      |capped AS (
      |  SELECT doc_id, phash, b, k FROM (
      |    SELECT *, row_number() OVER (PARTITION BY b, k ORDER BY doc_id) AS rn
      |    FROM bands) WHERE rn <= 16),
      |prs AS (
      |  SELECT d1, d2, bit_count(xor(p1, p2))::BIGINT AS hamming FROM (
      |    SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
      |      x.phash AS p1, y.phash AS p2
      |    FROM capped x JOIN capped y
      |      ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id)
      |  WHERE bit_count(xor(p1, p2)) <= 6)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_multimodal_crossmodal_neardup",
      (s, d) => {
        val ph = Multimodal.phash(
          Multimodal.pngPayload(Tables.documents(s, d), "doc_id"), "doc_id")
          .localCheckpoint(eager = false) // both join sides, one decode pass
        val bands = ph.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("b"))
          .select(col("doc_id"), col("phash"), col("b"),
            expr("shiftright(phash, cast(b * 16 as int)) & 65535").as("k"))
        val w = Window.partitionBy("b", "k").orderBy("doc_id")
        val capped = bands.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 16).drop("rn")
        val pairs = capped.as("x").join(capped.as("y"),
            expr("x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            col("x.phash").as("p1"), col("y.phash").as("p2"))
          .distinct()
          .select(col("d1"), col("d2"),
            expr("cast(bit_count(p1 ^ p2) as bigint)").as("hamming"))
          .filter(col("hamming") <= 6)
        val td = Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("th"))
        pairs
          .join(td.select(col("doc_id").as("d1"), col("th").as("t1")), "d1")
          .join(td.select(col("doc_id").as("d2"), col("th").as("t2")), "d2")
          .select(col("d1"), col("d2"), col("hamming"),
            when(col("t1") === col("t2"), lit("dup_cross_modal"))
              .otherwise(lit("image_only")).as("verdict"))
          .orderBy("d1", "d2")
      },
      s"""WITH $pairCtes,
         |td AS (SELECT doc_id, md5(text) AS th FROM documents)
         |SELECT p.d1, p.d2, p.hamming,
         |  CASE WHEN a.th = b.th THEN 'dup_cross_modal'
         |       ELSE 'image_only' END AS verdict
         |FROM prs p JOIN td a ON p.d1 = a.doc_id
         |           JOIN td b ON p.d2 = b.doc_id
         |ORDER BY p.d1, p.d2""".stripMargin))
}
