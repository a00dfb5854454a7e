package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Round-11 batch 8: k-center greedy coreset selection (the classic
  * diverse-subset / farthest-point-traversal curation primitive) and
  * Cohen's kappa inter-labeler agreement — two curation-pipeline
  * staples with exact oracles.
  */
object Round11Ops8 {

  private val K = 8

  /** One unrolled greedy step of the oracle: min quantized distance to
    * the selected set, argmax with vec_id tie-break. MATERIALIZED stops
    * DuckDB from inlining the CTE chain exponentially. */
  private def stepSql(k: Int): String = {
    val d = Similarity.l2sqSql("e.embedding", "c.embedding")
    s"""step$k AS MATERIALIZED (
       |  SELECT $k::BIGINT AS k, e.vec_id, e.embedding,
       |    min(floor(($d) * 1e8)::BIGINT) AS dmin
       |  FROM embeddings e, sel${k - 1} c
       |  WHERE e.vec_id NOT IN (SELECT vec_id FROM sel${k - 1})
       |  GROUP BY e.vec_id, e.embedding
       |  ORDER BY dmin DESC, e.vec_id ASC LIMIT 1),
       |sel$k AS MATERIALIZED (
       |  SELECT k, vec_id, embedding, dmin FROM sel${k - 1}
       |  UNION ALL SELECT k, vec_id, embedding, dmin FROM step$k)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // k-center greedy (farthest-point traversal, the 2-approximation of
    // Gonzalez '85): seed at vec_id 0, then 7× pick the vector whose
    // distance to its NEAREST already-selected center is largest — the
    // standard "maximally diverse subset" selector for eval sets and
    // annotation budgets. Distances are the shared l2sq left-fold
    // (bit-identical both engines) quantized to BIGINT at 1e-8 before
    // any comparison, so argmax ties resolve identically.
    //
    // Scale shape: K bounded driver iterations (the kmeans-centroid
    // discipline — selected set is K rows of model state, broadcast
    // back as literals); each step is ONE combinable min/argmax scan
    // (TakeOrdered, never a full sort); total work K·N distance
    // evaluations — the textbook greedy cost, embarrassingly parallel
    // per step.
    QueryDef("q_curation_coreset",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
        val seed = e.filter(col("vec_id") === 0)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .head()
        var selected =
          Vector((seed.getLong(0), seed.getSeq[Double](1).toIndexedSeq, 0L))
        for (_ <- 1 until K) {
          val dmin = selected.map { case (_, cv, _) =>
            floor(Similarity.l2sq(col("embedding"), typedlit(cv)) * lit(1e8))
              .cast("long")
          }.reduce(least(_, _))
          val row = e
            .filter(!col("vec_id").isin(selected.map(_._1): _*))
            .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"),
              dmin.as("dmin"))
            .orderBy(col("dmin").desc, col("vec_id").asc).limit(1)
            .head()
          selected = selected :+
            ((row.getLong(0), row.getSeq[Double](1).toIndexedSeq,
              row.getLong(2)))
        }
        selected.zipWithIndex
          .map { case ((id, _, dm), k) => (k.toLong, id, dm) }
          .toDF("k", "vec_id", "dmin")
          .orderBy("k")
      },
      s"""WITH sel0 AS MATERIALIZED (
        |  SELECT 0::BIGINT AS k, vec_id, embedding, 0::BIGINT AS dmin
        |  FROM embeddings WHERE vec_id = 0),
        |${(1 until K).map(stepSql).mkString(",\n")}
        |SELECT k, vec_id, dmin FROM sel${K - 1} ORDER BY k""".stripMargin),

    // Cohen's kappa between two heuristic quality labelers — length
    // (n_chars ≥ 300) vs punctuation density (a sentence-ender at least
    // every 20 words): chance-corrected agreement, the readout that
    // tells a curation team whether two cheap filters measure the same
    // thing. One combinable boolean-cell count; po/pe/kappa are one
    // scalar IEEE expression over the four BIGINT cells (identical
    // text both engines).
    QueryDef("q_quality_kappa",
      (s, d) => {
        Tables.documents(s, d)
          .select((col("n_chars") >= 300).as("a"),
            expr("""regexp_count(text, '[.!?]') * 20 >=
              size(filter(split(text, ' '), x -> x <> ''))""").as("b"))
          .agg(
            count(when(col("a") && col("b"), lit(1))).as("n11"),
            count(when(col("a") && !col("b"), lit(1))).as("n10"),
            count(when(!col("a") && col("b"), lit(1))).as("n01"),
            count(when(!col("a") && !col("b"), lit(1))).as("n00"))
          .withColumn("n", expr("n11 + n10 + n01 + n00"))
          .withColumn("po",
            expr("CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)"))
          .withColumn("pe", expr(
            """(CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"""))
          .withColumn("kappa", expr("(po - pe) / (1.0 - pe)"))
          .select("n", "n11", "n10", "n01", "n00", "po", "pe", "kappa")
      },
      """WITH lab AS (
        |  SELECT n_chars >= 300 AS a,
        |    len(regexp_extract_all(text, '[.!?]')) * 20 >=
        |      len(list_filter(string_split(text, ' '), x -> x <> '')) AS b
        |  FROM documents),
        |cells AS (
        |  SELECT count(CASE WHEN a AND b THEN 1 END)::BIGINT AS n11,
        |    count(CASE WHEN a AND NOT b THEN 1 END)::BIGINT AS n10,
        |    count(CASE WHEN NOT a AND b THEN 1 END)::BIGINT AS n01,
        |    count(CASE WHEN NOT a AND NOT b THEN 1 END)::BIGINT AS n00
        |  FROM lab),
        |wide AS (
        |  SELECT *, (n11 + n10 + n01 + n00)::BIGINT AS n,
        |    CAST(n11 + n00 AS DOUBLE)
        |      / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po,
        |    (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |      + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
        |      / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
        |         * CAST(n11 + n10 + n01 + n00 AS DOUBLE)) AS pe
        |  FROM cells)
        |SELECT n, n11, n10, n01, n00, po, pe,
        |  (po - pe) / (1.0 - pe) AS kappa
        |FROM wide""".stripMargin),
  )
}
