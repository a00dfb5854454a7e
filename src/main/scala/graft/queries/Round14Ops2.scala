package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 batch 2: distribution-shape statistics the curation stack
  * was missing (Gini concentration, jackknife variance of a ratio
  * estimator) plus the score-based half of hybrid retrieval
  * (q_similarity_rrf fuses RANKS; production vector stores default to
  * min-max-normalized convex score fusion — the "alpha" knob) and the
  * GROUP BY ALL grammar path through both engines' native parsers.
  *
  * Determinism discipline (QueryDef scaladoc): money in exact BIGINT
  * cents (the TpchQueries floor(x*100+0.5) bridge), big second moments
  * in DECIMAL(38,0) on Spark / HUGEINT on DuckDB, every float emitted
  * from ONE IEEE op chain written identically on both engines (pure
  * mul/div chains only — no a+b*c shapes that DuckDB may FMA-fuse),
  * and cross-channel fusion ranks on floor-quantized BIGINTs, never on
  * float sums.
  */
object Round14Ops2 {

  /** Exact cent count of a 2-decimal quantity stored as double
    * (TpchQueries.scala discipline). */
  private def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(100) + lit(0.5)).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // Gini coefficient of supplier revenue concentration per nation —
    // the inequality readout data-curation dashboards use for "is one
    // provider dominating this slice" (same family as q_agg_pareto's
    // 80/20 cut, but the full Lorenz integral). With per-supplier
    // revenue x_(1) ≤ … ≤ x_(n) (rank i by row_number):
    //   G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x)
    // The formula is tie-order invariant (swapping equal x across
    // adjacent ranks leaves Σ i·x unchanged), so row_number with a
    // suppkey tiebreak is deterministic AND semantically safe.
    //
    // Scale shape: one map-side-combined groupBy over the fact table →
    // a supplier-sized frame; the rank window partitions by nation over
    // that AGGREGATED frame (suppliers/nation ~ n_supp/25, never
    // fact-sized); dimensions broadcast. Overflow: Σ i·x accumulates in
    // DECIMAL(38,0) (i ≤ 4e4 and x ≤ ~1e14 cents at sf10-equivalent →
    // Σ ≲ 4e18·rows — BIGINT would brush its edge at 100×, decimal has
    // 20 digits of headroom); DuckDB accumulates the same product in
    // HUGEINT. gini and rev_total are each ONE division of exact ints.
    QueryDef("q_stats_gini",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy("l_suppkey")
          .agg(sum(cents(col("l_extendedprice"))).as("rev"))
        val sup = rev
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("s_suppkey"), col("rev"))
        val w = Window.partitionBy("n_name")
          .orderBy(col("rev").asc, col("s_suppkey").asc)
        sup
          .withColumn("i", row_number().over(w).cast("long"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_suppliers"),
            sum("rev").as("srev"),
            sum(col("i").cast("decimal(19,0)") *
              col("rev").cast("decimal(19,0)")).as("sirev"))
          .select(col("n_name"), col("n_suppliers"),
            (col("srev").cast("double") / lit(100.0)).as("rev_total"),
            ((col("sirev") * lit(2) -
              (col("n_suppliers") + lit(1)).cast("decimal(19,0)") *
                col("srev").cast("decimal(19,0)")).cast("double") /
              (col("n_suppliers").cast("decimal(19,0)") *
                col("srev").cast("decimal(19,0)")).cast("double")).as("gini"))
          .orderBy("n_name")
      },
      """WITH rev AS (
        |  SELECT l_suppkey, sum(floor(l_extendedprice * 100 + 0.5)::BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |sup AS (
        |  SELECT n_name, s_suppkey, rev,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY rev ASC, s_suppkey ASC) AS i
        |  FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey)
        |SELECT n_name, count(*)::BIGINT AS n_suppliers,
        |  sum(rev)::DOUBLE / 100.0 AS rev_total,
        |  (2::HUGEINT * sum(i::HUGEINT * rev::HUGEINT)
        |     - (count(*) + 1)::HUGEINT * sum(rev)::HUGEINT)::DOUBLE
        |    / ((count(*)::HUGEINT * sum(rev)::HUGEINT)::DOUBLE) AS gini
        |FROM sup GROUP BY n_name ORDER BY n_name""".stripMargin),

    // Jackknife variance of the per-returnflag ratio estimator
    // R = Σprice / Σqty (cents per unit) — the resampling-free
    // uncertainty readout for ratio metrics (mean price per unit,
    // tokens per document, dedup rate), where the naive per-row
    // variance is WRONG because numerator and denominator co-vary.
    // Leave-one-out pseudovalues need no second scan per row: with
    // group totals (S_p, S_q) broadcast back, R_i = (S_p−p_i)/(S_q−q_i)
    // is a per-row expression — the classic "broadcast the sufficient
    // statistics" jackknife. Pseudovalues are floor-quantized to 1e-4
    // cents/unit before the moment sums (the LlmOps9 quantization
    // bridge: float sums are order-dependent, BIGINT sums are not), so
    // the reported variance is of the QUANTIZED pseudovalues — bias
    // < 1e-4 per value, documented, and bit-stable on both engines.
    //   var_jack = (n−1)/n · Σ(r_i − r̄)²
    //            = (n·Sq − S²)/n² · (n−1)/n / 1e8   (r in 1e-4 units)
    // computed as one pure mul/div chain over exact moments (no a+b·c
    // shape — DuckDB may FMA-fuse those; QueryDef scaladoc).
    //
    // Scale shape: two passes over the facts (totals, then moments),
    // both map-side combined; the totals frame is 3 rows and
    // broadcasts. Moments in DECIMAL(38,0)/HUGEINT: ri² ≲ 2.3e18,
    // summed over 6e9 rows at sf1000-equivalent ≈ 1.4e28, so the final
    // expression keeps s1/s2 at DECIMAL(38,0): n·s2 ≈ 6e9·1.4e28 ≈
    // 8.4e37 and s1² ≈ (6e18)² ≈ 3.6e37 both fit 38 digits (and
    // HUGEINT's ~1.7e38 on the oracle side) — the r14 draft downcast
    // s2 to DECIMAL(28,0)/s1 to DECIMAL(19,0), which would null out
    // jk_var at exactly the documented scale (ADVICE r14, fixed r15).
    QueryDef("q_stats_jackknife",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("pc"),
          col("l_quantity").cast("long").as("qc"))
        val tot = li.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("pc").as("sp"), sum("qc").as("sq"))
        li.join(broadcast(tot), "l_returnflag")
          .withColumn("ri", floor(
            ((col("sp") - col("pc")).cast("double") /
              (col("sq") - col("qc")).cast("double")) * lit(1e4)).cast("long"))
          .groupBy("l_returnflag")
          .agg(first("n").as("n"), first("sp").as("sp"), first("sq").as("sq"),
            sum(col("ri").cast("decimal(38,0)")).as("s1"),
            sum(col("ri").cast("decimal(19,0)") *
              col("ri").cast("decimal(19,0)")).as("s2"))
          .select(col("l_returnflag"), col("n"),
            (col("sp").cast("double") / col("sq").cast("double"))
              .as("ratio_cents"),
            expr("""(CAST(CAST(n AS DECIMAL(38,0)) * CAST(s2 AS DECIMAL(38,0))
                - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))
                  AS DOUBLE)
                / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
                * (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE) / 1e8)""")
              .as("jk_var"))
          .withColumn("jk_se", sqrt(col("jk_var")))
          .orderBy("l_returnflag")
      },
      """WITH li AS (
        |  SELECT l_returnflag,
        |    floor(l_extendedprice * 100 + 0.5)::BIGINT AS pc,
        |    l_quantity::BIGINT AS qc
        |  FROM lineitem),
        |tot AS (
        |  SELECT l_returnflag, count(*)::BIGINT AS n,
        |    sum(pc)::BIGINT AS sp, sum(qc)::BIGINT AS sq
        |  FROM li GROUP BY 1),
        |pv AS (
        |  SELECT li.l_returnflag, n, sp, sq,
        |    floor(((sp - pc)::DOUBLE / (sq - qc)::DOUBLE) * 1e4)::BIGINT AS ri
        |  FROM li JOIN tot USING (l_returnflag)),
        |m AS (
        |  SELECT l_returnflag, any_value(n) AS n,
        |    any_value(sp) AS sp, any_value(sq) AS sq,
        |    sum(ri::HUGEINT) AS s1, sum(ri::HUGEINT * ri::HUGEINT) AS s2
        |  FROM pv GROUP BY 1)
        |SELECT l_returnflag, n::BIGINT AS n,
        |  sp::DOUBLE / sq::DOUBLE AS ratio_cents,
        |  ((n::HUGEINT * s2 - s1 * s1)::DOUBLE
        |    / n::DOUBLE / n::DOUBLE * (n::DOUBLE - 1.0) / n::DOUBLE / 1e8)
        |    AS jk_var,
        |  sqrt((n::HUGEINT * s2 - s1 * s1)::DOUBLE
        |    / n::DOUBLE / n::DOUBLE * (n::DOUBLE - 1.0) / n::DOUBLE / 1e8)
        |    AS jk_se
        |FROM m ORDER BY l_returnflag""".stripMargin),

    // Hybrid dense+sparse retrieval with min-max score fusion — the
    // OTHER fusion family next to q_similarity_rrf: RRF fuses ranks
    // (scores discarded), production "hybrid alpha" search fuses
    // NORMALIZED SCORES: each channel's retrieved list is min-max
    // normalized within the query, fused = α·dense + (1−α)·sparse
    // (α = 0.7 here). Dense channel = exact cosine; sparse channel =
    // 16-bit sign-sketch hamming similarity (the binary-rescoring
    // stand-in for a lexical scorer — integer-exact). A candidate a
    // channel did NOT retrieve contributes 0 in that channel (list-wise
    // normalization over retrieved sets — the standard convention).
    // Fusion ranks on 7·⌊dn·1e9⌋ + 3·⌊sn·1e9⌋ (BIGINT): float convex
    // combinations are a+b·c shapes DuckDB may FMA-fuse (q_text_bm25
    // lesson); floor-quantizing each bit-identical normalized score
    // first makes the fused key integer-exact on both engines.
    //
    // Scale shape: queries (4 rows) broadcast; the corpus scans ONCE
    // and both channels score in the same projection; the per-query
    // top-20 windows partition by q_id over the scored frame — the
    // q_similarity_topk brute-force baseline shape (the IVF/PQ variants
    // are this family's documented scale path); min/max normalizers
    // reduce the ≤20-row retained lists and broadcast back.
    QueryDef("q_similarity_hybrid",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d).withColumn("bucket",
          graft.functions.Similarity.signBucket(col("embedding"), 16))
        val q = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("bucket").as("q_bucket"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            call_function("cosine_sim", col("embedding"), col("q_emb"))
              .as("cosine"),
            (lit(16L) - expr("bit_count(bucket ^ q_bucket)").cast("long"))
              .as("hamming"))
        val wq = Window.partitionBy("q_id")
        val flagged = scored
          .withColumn("r_cos", row_number().over(
            wq.orderBy(col("cosine").desc, col("neighbor_id").asc)))
          .withColumn("r_ham", row_number().over(
            wq.orderBy(col("hamming").desc, col("neighbor_id").asc)))
          .filter(col("r_cos") <= 20 || col("r_ham") <= 20)
        val cnorm = flagged.filter(col("r_cos") <= 20).groupBy("q_id")
          .agg(min("cosine").as("cmin"), max("cosine").as("cmax"))
        val hnorm = flagged.filter(col("r_ham") <= 20).groupBy("q_id")
          .agg(min("hamming").as("hmin"), max("hamming").as("hmax"))
        flagged
          .join(broadcast(cnorm), "q_id").join(broadcast(hnorm), "q_id")
          .withColumn("dn", when(col("r_cos") <= 20,
            (col("cosine") - col("cmin")) /
              nullif(col("cmax") - col("cmin"), lit(0.0))).otherwise(lit(0.0)))
          .withColumn("sn", when(col("r_ham") <= 20,
            (col("hamming") - col("hmin")).cast("double") /
              nullif((col("hmax") - col("hmin")).cast("double"), lit(0.0)))
            .otherwise(lit(0.0)))
          .withColumn("fused_q",
            lit(7L) * floor(coalesce(col("dn"), lit(1.0)) * lit(1e9)).cast("long") +
            lit(3L) * floor(coalesce(col("sn"), lit(1.0)) * lit(1e9)).cast("long"))
          .withColumn("fused_rank", row_number().over(
            wq.orderBy(col("fused_q").desc, col("neighbor_id").asc)).cast("long"))
          .filter(col("fused_rank") <= 10)
          .select(col("q_id"), col("fused_rank"), col("neighbor_id"),
            col("hamming"), col("cosine"),
            (col("fused_q").cast("double") / lit(1e10)).as("fused"))
          .orderBy("q_id", "fused_rank")
      },
      s"""WITH e AS (SELECT vec_id, embedding,
        |    ${graft.functions.Similarity.signBucketSql("embedding", 16)}::BIGINT AS bucket
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
        |      FROM e WHERE vec_id < 4),
        |scored AS (
        |  SELECT q_id, e.vec_id AS neighbor_id,
        |    ${graft.functions.Similarity.cosineSql("e.embedding", "q.q_emb")} AS cosine,
        |    16 - bit_count(xor(e.bucket, q.q_bucket)) AS hamming
        |  FROM e, q WHERE e.vec_id <> q.q_id),
        |flagged AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, neighbor_id ASC) AS r_cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY hamming DESC, neighbor_id ASC) AS r_ham
        |  FROM scored
        |  QUALIFY r_cos <= 20 OR r_ham <= 20),
        |cnorm AS (SELECT q_id, min(cosine) AS cmin, max(cosine) AS cmax
        |          FROM flagged WHERE r_cos <= 20 GROUP BY 1),
        |hnorm AS (SELECT q_id, min(hamming) AS hmin, max(hamming) AS hmax
        |          FROM flagged WHERE r_ham <= 20 GROUP BY 1),
        |fused AS (
        |  SELECT f.q_id, neighbor_id, hamming, cosine,
        |    7 * floor(coalesce(CASE WHEN r_cos <= 20
        |        THEN (cosine - cmin) / nullif(cmax - cmin, 0.0)
        |        ELSE 0.0 END, 1.0) * 1e9)::BIGINT
        |    + 3 * floor(coalesce(CASE WHEN r_ham <= 20
        |        THEN (hamming - hmin)::DOUBLE / nullif((hmax - hmin)::DOUBLE, 0.0)
        |        ELSE 0.0 END, 1.0) * 1e9)::BIGINT AS fused_q
        |  FROM flagged f JOIN cnorm USING (q_id) JOIN hnorm USING (q_id))
        |SELECT q_id, fused_rank, neighbor_id, hamming::BIGINT AS hamming,
        |  cosine, fused_q::DOUBLE / 1e10 AS fused
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY fused_q DESC, neighbor_id ASC) AS fused_rank
        |      FROM fused)
        |WHERE fused_rank <= 10 ORDER BY q_id, fused_rank""".stripMargin),

    // GROUP BY ALL through both engines' native grammars — the
    // "group by every non-aggregate select item" shorthand analysts
    // lean on (and the one place a grouping-resolution bug silently
    // regroups a query). The statement text is semantically identical
    // on both sides (the q_sql_qualify cross-engine discipline); money
    // sums in exact cents, emitted through one division.
    //
    // Scale shape: one map-side-combined groupBy; nothing else.
    QueryDef("q_sql_groupbyall",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q14g")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     AS DOUBLE) / 100.0 AS sum_price
          FROM lineitem_q14g
          GROUP BY ALL
          ORDER BY l_returnflag, l_linestatus""")
      },
      """SELECT l_returnflag, l_linestatus,
        |  count(*)::BIGINT AS cnt,
        |  sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
        |  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::DOUBLE / 100.0
        |    AS sum_price
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))
}
