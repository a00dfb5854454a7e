package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity
import graft.ops.TextAnalysis

/** Round-11 batch 9: interpolated Kneser-Ney bigram scoring (the
  * standard n-gram smoothing, one model class up from
  * q_text_bigram_nll's Stupid Backoff) and hard-negative mining for
  * contrastive training (top-k nearest DIFFERENT-label vectors).
  */
object Round11Ops9 {

  val defs: Seq[QueryDef] = Seq(

    // Interpolated Kneser-Ney (D = 3/4): held-out docs scored by
    //   p(w2|w1) = max(c12 − D, 0)/c1 + D·N1+(w1·)/c1 · p_cont(w2)
    //   p_cont(w2) = (N1+(·w2) + 1)/(F + V)      (add-one so OOV > 0)
    // trained on the same content-hash 80% split as q_text_bigram_nll.
    // The whole probability reduces to ONE division of products of
    // exact BIGINTs (D = 3/4 clears denominators):
    //   seen w1:  (max(4·c12 − 3, 0)·F' + 3·N1w1·E') / (4·c1·F')
    //   unseen:   E'/F'
    // with E' = preceders(w2)+1, F' = types+V. Numerator/denominator
    // multiply as DOUBLEs in identical op order on both engines (past
    // 2^53 they round — identically), then ln_ieee + the
    // (w1,w2)-sorted per-doc left fold: the established recipe.
    //
    // Scale shape: the only corpus-scaled shuffles are the bigram
    // count groupBys; continuation tables (followers per w1, preceders
    // per w2) are vocab-bounded aggregates of the bigram-type table;
    // scalars (F, V) broadcast.
    QueryDef("q_text_kn_nll",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        // documentsBalanced (r17): both bigram explodes and the train
        // word explode are scan-stage map work, single-threaded on the
        // one-row-group local corpus otherwise
        val docs = Tables.documentsBalanced(s, d)
        def bg(df: DataFrame) = df.select(col("doc_id"),
            explode(TextAnalysis.bigrams(split(col("text"), " "), " ")).as("bigram"))
          .select(col("doc_id"), split(col("bigram"), " ")(0).as("w1"),
            split(col("bigram"), " ")(1).as("w2"))
        val tf12 = bg(docs).groupBy("doc_id", "w1", "w2")
          .agg(count(lit(1)).as("tf12"))
        val train = docs.filter(pmod(
          conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
            .cast("long"), lit(100L)) < 80)
        val tbg = bg(train).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          .localCheckpoint(eager = false) // feeds c1, followers, preceders, F
        val c1t = tbg.groupBy("w1").agg(sum("c12").as("c1"),
          count(lit(1)).as("n1w1"))
        val prec = tbg.groupBy("w2").agg(count(lit(1)).as("e"))
        val scal = tbg.agg(count(lit(1)).as("f"))
          .crossJoin(train.select(explode(split(col("text"), " ")).as("w"))
            .agg(countDistinct("w").as("v")))
        def ln(c: org.apache.spark.sql.Column) = call_function("ln_ieee", c)
        val fp = (col("f") + col("v")).cast("double")
        val ep = (coalesce(col("e"), lit(0L)) + 1L).cast("double")
        val disc = greatest(lit(4L) * coalesce(col("c12"), lit(0L)) - 3L,
          lit(0L)).cast("double")
        val score =
          when(col("c1").isNotNull,
            ln((disc * fp + lit(3.0) * col("n1w1").cast("double") * ep) /
              (lit(4.0) * col("c1").cast("double") * fp)))
          .otherwise(ln(ep / fp))
        val terms = tf12
          .join(tbg, Seq("w1", "w2"), "left")
          .join(broadcast(c1t), Seq("w1"), "left")
          .join(broadcast(prec), Seq("w2"), "left")
          .crossJoin(broadcast(scal))
          .select(col("doc_id"), col("w1"), col("w2"), col("tf12"),
            when(col("c12").isNull, col("tf12")).otherwise(lit(0L)).as("bo"),
            (col("tf12") * score).as("term"))
        terms.groupBy("doc_id")
          .agg(sum("tf12").as("n_bg"), sum("bo").as("n_unseen"),
            array_sort(collect_list(struct(col("w1"), col("w2"), col("term"))))
              .as("wt"))
          .select(col("doc_id"), col("n_bg"), col("n_unseen"),
            (lit(-1.0) * aggregate(
              transform(col("wt"), e => e.getField("term")),
              lit(0.0), (acc, x) => acc + x) / col("n_bg").cast("double"))
              .as("nll"))
          .orderBy("doc_id")
      },
      """WITH bgall AS (
  SELECT doc_id, string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
        FROM documents) b0),
tf12 AS (SELECT doc_id, w1, w2, count(*) AS tf12 FROM bgall GROUP BY 1, 2, 3),
train AS (SELECT * FROM documents
          WHERE ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 80),
tbg AS (SELECT string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2,
          count(*) AS c12
        FROM (SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
              FROM train) t0
        GROUP BY 1, 2),
c1t AS (SELECT w1, sum(c12) AS c1, count(*) AS n1w1 FROM tbg GROUP BY 1),
prec AS (SELECT w2, count(*) AS e FROM tbg GROUP BY 1),
scal AS (SELECT (SELECT count(*) FROM tbg) AS f,
                (SELECT count(DISTINCT word) FROM
                  (SELECT unnest(string_split(text, ' ')) AS word FROM train) u0) AS v),
terms AS (
  SELECT doc_id, f0.w1, f0.w2, tf12,
    CASE WHEN c12 IS NULL THEN tf12 ELSE 0 END AS bo,
    tf12 * (CASE
      WHEN c1 IS NOT NULL THEN ln(
        (greatest(4 * coalesce(c12, 0) - 3, 0)::DOUBLE * (f + v)::DOUBLE
          + 3.0 * n1w1::DOUBLE * (coalesce(e, 0) + 1)::DOUBLE)
        / (4.0 * c1::DOUBLE * (f + v)::DOUBLE))
      ELSE ln((coalesce(e, 0) + 1)::DOUBLE / (f + v)::DOUBLE) END) AS term
  FROM tf12 f0
    LEFT JOIN tbg g ON f0.w1 = g.w1 AND f0.w2 = g.w2
    LEFT JOIN c1t u1 ON f0.w1 = u1.w1
    LEFT JOIN prec u2 ON f0.w2 = u2.w2, scal),
agg AS (SELECT doc_id, sum(tf12) AS n_bg, sum(bo) AS n_unseen,
          list_sort(list(struct_pack(w1 := w1, w2 := w2, term := term))) AS wt
        FROM terms GROUP BY 1)
SELECT doc_id, n_bg::BIGINT AS n_bg, n_unseen::BIGINT AS n_unseen,
  -1.0 * list_reduce(list_prepend(0.0,
    list_transform(wt, e -> struct_extract(e, 'term'))),
    (a, b) -> a + b) / n_bg::DOUBLE AS nll
FROM agg ORDER BY doc_id"""),

    // Hard-negative mining for contrastive training: for each anchor
    // (vec_id < 5), the top-5 most-similar vectors with a DIFFERENT
    // label — the pairs a contrastive loss learns most from — plus the
    // margin to the anchor's nearest SAME-label positive. Reuses the
    // bit-identical cosine; floats feed only rank windows with vec_id
    // tie-breaks.
    //
    // Scale shape: anchors broadcast (bounded query set); one scan
    // scores the corpus; per-anchor top-k via rank-limited windows
    // (WindowGroupLimit). The label constraint is a row predicate —
    // no extra shuffle.
    QueryDef("q_emb_hardnegatives",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
        val anchors = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
            col("label").as("a_label"))
        val scored = e.crossJoin(broadcast(anchors))
          .filter(col("vec_id") =!= col("a_id"))
          .select(col("a_id"), col("a_label"), col("vec_id"), col("label"),
            call_function("cosine_sim", col("embedding"), col("a_emb"))
              .as("sim"))
        val wA = Window.partitionBy("a_id")
        val pos = scored.filter(col("label") === col("a_label"))
          .groupBy("a_id").agg(max("sim").as("best_pos_sim"))
        scored.filter(col("label") =!= col("a_label"))
          .withColumn("rn", row_number().over(
            wA.orderBy(col("sim").desc, col("vec_id").asc)).cast("long"))
          .filter(col("rn") <= 5)
          .join(broadcast(pos), Seq("a_id"), "left")
          .select(col("a_id"), col("rn"), col("vec_id").as("neg_id"),
            col("label").as("neg_label"), col("sim"),
            (coalesce(col("best_pos_sim"), lit(0.0)) - col("sim"))
              .as("margin"))
          .orderBy("a_id", "rn")
      },
      s"""WITH a AS (SELECT vec_id AS a_id, embedding AS a_emb, label AS a_label
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT a_id, a_label, e.vec_id, e.label,
        |    ${Similarity.cosineSql("e.embedding", "a.a_emb")} AS sim
        |  FROM embeddings e, a WHERE e.vec_id <> a.a_id),
        |pos AS (SELECT a_id, max(sim) AS best_pos_sim FROM scored
        |        WHERE label = a_label GROUP BY 1),
        |negs AS (
        |  SELECT a_id, vec_id, label, sim, row_number() OVER (
        |    PARTITION BY a_id ORDER BY sim DESC, vec_id ASC) AS rn
        |  FROM scored WHERE label <> a_label)
        |SELECT negs.a_id AS a_id, rn::BIGINT AS rn, vec_id AS neg_id,
        |  label AS neg_label, sim,
        |  (coalesce(best_pos_sim, 0.0) - sim) AS margin
        |FROM negs LEFT JOIN pos ON negs.a_id = pos.a_id
        |WHERE rn <= 5
        |ORDER BY negs.a_id, rn""".stripMargin),
  )
}
