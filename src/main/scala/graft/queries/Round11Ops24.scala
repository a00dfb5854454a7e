package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Round-11 batch 24: filtered vector search (top-k under a metadata
  * predicate — the "ANN + WHERE clause" shape every production vector
  * store has to serve) and Cohen's d effect size (the
  * practical-significance companion to the t-test's p-value).
  *
  * Scale shapes: filtered search pushes the predicate INTO the
  * candidate side before ranking (prune-then-rank — the filter shrinks
  * the bucket joins, never the other way around); effect size is one
  * combinable moment aggregate in exact integer cents.
  */
object Round11Ops24 {

  val defs: Seq[QueryDef] = Seq(

    // Filtered top-3 cosine search: for each of 5 probe vectors
    // (vec_id < 5), the nearest neighbors AMONG label-0 vectors only.
    // The label predicate lands on the candidate side BEFORE the
    // bucket join and ranking — at scale this is the difference
    // between searching the whole index and searching one shard of it
    // (post-filtering a top-k can return < k rows; pre-filtering
    // cannot).
    QueryDef("q_similarity_filtered",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBucket(col("embedding"), 4))
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("src"), col("embedding").as("emb_a"),
            col("bucket"))
        val cands = e.filter(col("label") === 0)
          .select(col("vec_id").as("dst"), col("embedding").as("emb_b"),
            col("bucket"))
        val w = Window.partitionBy("src")
          .orderBy(col("cosine_sim").desc, col("dst").asc)
        probes.join(cands, Seq("bucket"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            call_function("cosine_sim", col("emb_a"), col("emb_b"))
              .as("cosine_sim"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("src", "rn", "dst", "cosine_sim")
          .orderBy("src", "rn")
      },
      s"""WITH e AS (SELECT vec_id, label, embedding,
        |         ${Similarity.signBucketSql("embedding", 4)}::BIGINT AS bucket
        |       FROM embeddings),
        |p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |        ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cosine_sim
        |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        |      WHERE a.vec_id < 5 AND b.label = 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY src
        |        ORDER BY cosine_sim DESC, dst ASC) AS rn FROM p)
        |SELECT src, rn::BIGINT AS rn, dst, cosine_sim FROM r WHERE rn <= 3
        |ORDER BY src, rn""".stripMargin),

    // Cohen's d between returned (R) and accepted (A) line quantities:
    // d = (mean_R − mean_A) / s_pooled with the unbiased pooled
    // variance. Quantities are integral, so every moment is a BIGINT
    // sum and the one float expression is the final closed form —
    // the effect-size readout that says whether q_stats_mannwhitney's
    // significant shift is also a LARGE shift.
    QueryDef("q_stats_effect_size",
      (s, d) => {
        val agg = Tables.lineitem(s, d)
          .filter(col("l_returnflag").isin("R", "A"))
          .select((col("l_returnflag") === "R").as("is_r"),
            col("l_quantity").cast("long").as("q"))
          .agg(
            count(when(col("is_r"), lit(1))).cast("long").as("n_r"),
            sum(when(col("is_r"), col("q")).otherwise(lit(0L)))
              .cast("long").as("s_r"),
            sum(when(col("is_r"), col("q") * col("q")).otherwise(lit(0L)))
              .cast("long").as("ss_r"),
            count(when(!col("is_r"), lit(1))).cast("long").as("n_a"),
            sum(when(!col("is_r"), col("q")).otherwise(lit(0L)))
              .cast("long").as("s_a"),
            sum(when(!col("is_r"), col("q") * col("q")).otherwise(lit(0L)))
              .cast("long").as("ss_a"))
        agg
          .withColumn("mean_r",
            expr("CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)"))
          .withColumn("mean_a",
            expr("CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"))
          .withColumn("d",
            expr("""(CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)
                - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
              / sqrt(((CAST(ss_r AS DOUBLE)
                  - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                + (CAST(ss_a AS DOUBLE)
                  - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
                / (CAST(n_r AS DOUBLE) + CAST(n_a AS DOUBLE) - 2.0))"""))
          .select("n_r", "n_a", "mean_r", "mean_a", "d")
      },
      """WITH agg AS (
        |  SELECT
        |    count(CASE WHEN l_returnflag = 'R' THEN 1 END)::BIGINT AS n_r,
        |    sum(CASE WHEN l_returnflag = 'R' THEN l_quantity::BIGINT
        |        ELSE 0 END)::BIGINT AS s_r,
        |    sum(CASE WHEN l_returnflag = 'R'
        |        THEN l_quantity::BIGINT * l_quantity::BIGINT
        |        ELSE 0 END)::BIGINT AS ss_r,
        |    count(CASE WHEN l_returnflag = 'A' THEN 1 END)::BIGINT AS n_a,
        |    sum(CASE WHEN l_returnflag = 'A' THEN l_quantity::BIGINT
        |        ELSE 0 END)::BIGINT AS s_a,
        |    sum(CASE WHEN l_returnflag = 'A'
        |        THEN l_quantity::BIGINT * l_quantity::BIGINT
        |        ELSE 0 END)::BIGINT AS ss_a
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A'))
        |SELECT n_r, n_a,
        |  s_r::DOUBLE / n_r::DOUBLE AS mean_r,
        |  s_a::DOUBLE / n_a::DOUBLE AS mean_a,
        |  (s_r::DOUBLE / n_r::DOUBLE - s_a::DOUBLE / n_a::DOUBLE)
        |    / sqrt(((ss_r::DOUBLE - s_r::DOUBLE * s_r::DOUBLE / n_r::DOUBLE)
        |      + (ss_a::DOUBLE - s_a::DOUBLE * s_a::DOUBLE / n_a::DOUBLE))
        |      / (n_r::DOUBLE + n_a::DOUBLE - 2.0)) AS d
        |FROM agg""".stripMargin),
  )
}
