package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 7: Kaplan-Meier survival (time-to-churn with
  * right-censoring) and reciprocal-rank-fusion hybrid retrieval
  * (BM25 ⊕ embedding-cosine) — one lifecycle-analytics staple, one
  * modern-search staple.
  */
object Round11Ops7 {

  val defs: Seq[QueryDef] = Seq(

    // Kaplan-Meier estimator of "time to churn": a user's lifetime is
    // last-event − first-event in whole days; users whose last event
    // falls in the final 7 days of the observation window are
    // right-CENSORED (still alive — the defining complication survival
    // analysis exists to handle; naive mean-lifetime would bias low).
    // S(t) = Π_{u ≤ t} (n_u − d_u)/n_u over the ≤|window-days| day
    // frame, in integer micro fixed-point (floor at each step — the
    // q_events_markov_stationary discipline), so both engines fold the
    // same BIGINTs and the curve hash-matches exactly.
    //
    // Scale shape: ONE combinable per-user min/max scan (fact-sized),
    // then everything lives on the bounded day frame: at-risk counts
    // via a prefix sum over |days| rows, and the product curve via an
    // indexed prefix fold over the COLLECTED day array (≤ |days|² ≈ 1k
    // integer ops, in-row). Each day's (n−d, n) packs into one BIGINT
    // (n < 2³²; for >4B-user corpora widen the packing shift) so the
    // fold accumulator stays a plain BIGINT on both engines.
    QueryDef("q_events_survival",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"))
        val spans = ev.groupBy("user_id")
          .agg(min("tm").as("first_tm"), max("tm").as("last_tm"))
        val wend = ev.agg(max("tm").as("wend"))
        val perUser = spans.crossJoin(broadcast(wend))
          .select(
            expr("(last_tm - first_tm) div 86400000").as("t"),
            (col("last_tm") >= col("wend") - lit(7L * 86400000L)).as("cens"))
        val days = perUser.groupBy("t")
          .agg(count(when(!col("cens"), lit(1))).as("d"),
            count(when(col("cens"), lit(1))).as("c"))
        val w = Window.orderBy("t")
        val atRisk = days
          .withColumn("total", sum(col("d") + col("c")).over(
            Window.partitionBy()))
          .withColumn("n", col("total") - coalesce(
            sum(col("d") + col("c")).over(
              w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("t", "d", "c", "n")
        atRisk.groupBy(lit(1).as("g"))
          .agg(array_sort(collect_list(struct(
            col("t"), col("d"), col("c"), col("n")))).as("days"))
          .withColumn("curve", expr("""
            transform(days, (x, i) -> struct(
              x.t AS t, x.n AS n_at_risk, x.d AS churned, x.c AS censored,
              aggregate(
                transform(slice(days, 1, i + 1),
                  e -> (e.n - e.d) * 4294967296L + e.n),
                CAST(1000000 AS BIGINT),
                (acc, m) -> (acc * (m div 4294967296)) div (m % 4294967296))
                AS s_micro))"""))
          .select(explode(col("curve")).as("r"))
          .select("r.t", "r.n_at_risk", "r.churned", "r.censored", "r.s_micro")
          .orderBy("t")
      },
      """WITH ev AS (
        |  SELECT user_id,
        |    epoch_ms(date_trunc('millisecond', ts))::BIGINT AS tm
        |  FROM events),
        |spans AS (
        |  SELECT user_id, min(tm) AS first_tm, max(tm) AS last_tm
        |  FROM ev GROUP BY 1),
        |per_user AS (
        |  SELECT ((last_tm - first_tm) // 86400000)::BIGINT AS t,
        |    last_tm >= (SELECT max(tm) FROM ev) - 7 * 86400000 AS cens
        |  FROM spans),
        |days AS (
        |  SELECT t, count(CASE WHEN NOT cens THEN 1 END)::BIGINT AS d,
        |    count(CASE WHEN cens THEN 1 END)::BIGINT AS c
        |  FROM per_user GROUP BY 1),
        |at_risk AS (
        |  SELECT t, d, c,
        |    (sum(d + c) OVER () - coalesce(sum(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
        |      AS n
        |  FROM days),
        |packed AS (
        |  SELECT list_sort(list(struct_pack(t := t, d := d, c := c, n := n)))
        |    AS days
        |  FROM at_risk),
        |curve AS (
        |  SELECT unnest(list_transform(days, (x, i) -> struct_pack(
        |    t := struct_extract(x, 't'),
        |    n_at_risk := struct_extract(x, 'n'),
        |    churned := struct_extract(x, 'd'),
        |    censored := struct_extract(x, 'c'),
        |    s_micro := list_reduce(
        |      list_prepend(1000000::BIGINT,
        |        list_transform(list_slice(days, 1, i),
        |          e -> (struct_extract(e, 'n') - struct_extract(e, 'd'))
        |            * 4294967296 + struct_extract(e, 'n'))),
        |      (acc, m) -> (acc * (m // 4294967296)) // (m % 4294967296)))))
        |    AS r
        |  FROM packed)
        |SELECT struct_extract(r, 't')::BIGINT AS t,
        |  struct_extract(r, 'n_at_risk')::BIGINT AS n_at_risk,
        |  struct_extract(r, 'churned')::BIGINT AS churned,
        |  struct_extract(r, 'censored')::BIGINT AS censored,
        |  struct_extract(r, 's_micro')::BIGINT AS s_micro
        |FROM curve ORDER BY t""".stripMargin),

    // Reciprocal-rank fusion: the standard way hybrid search merges a
    // lexical (BM25) and a semantic (embedding-cosine) ranking without
    // comparable scores — fused(d) = Σ_lists 1/(60 + rank_d). Each
    // query doc (vec_id < 3) retrieves top-20 by BM25 over its own
    // top-3 tf terms and top-20 by cosine; the fusion joins the two
    // bounded rank lists. Floats enter ONLY through ranks (integers on
    // both engines — BM25 uses the exact-BIGINT/LnIeee restructure of
    // q_text_bm25, cosine the shared cosine_sim expression), and the
    // fused score is a fixed two-term IEEE sum, so the output
    // hash-matches.
    //
    // Scale shape: query set and rank lists are bounded (|Q|·20 rows);
    // the corpus-scaled work is one tf build (combinable) + one
    // tf⋈terms semi-join + one broadcast cosine scan — no all-pairs
    // anything; top-20 per query via rank-limited windows
    // (WindowGroupLimit prunes past the shuffle).
    QueryDef("q_similarity_rrf",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        graft.functions.CosineSimExpr.register(s)
        val docs = Tables.documents(s, d)
        val tokens = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        // NOT staged (r17 optimization round, measured and rejected):
        // staging tf + deriving dl/n_tokens as Σ tf cut the plan's six
        // corpus explodes to one but measured 1.18 → 1.35 s — the
        // per-session parquet write of the corpus-sized tf frame costs
        // more than the (cheap, parallel) explode rebuilds it saves at
        // this scan size. Shape kept; revisit if the token stream ever
        // dominates the profile.
        val tf = tokens.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val dl = tokens.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = docs.agg(count(lit(1)).as("n_docs"))
          .crossJoin(tokens.agg(count(lit(1)).as("n_tokens")))
        // per-query terms: top-3 of the query doc's own tf
        val qterms = tf.filter(col("doc_id") < 3)
          .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("tf").desc, col("word").asc)))
          .filter(col("rn") <= 3)
          .select(col("doc_id").as("q_id"), col("word"))
        val df = tf.join(broadcast(qterms.select("word").distinct()), "word")
          .groupBy("word").agg(count(lit(1)).as("df"))
        val idf = call_function("ln_ieee",
          (col("n_docs") * 2 + lit(2)).cast("double") / (col("df") * 2 + lit(1)))
        val num = col("tf") * lit(22L) * col("n_tokens")
        val den = col("tf") * lit(10L) * col("n_tokens") +
          lit(3L) * col("n_tokens") + lit(9L) * col("dl") * col("n_docs")
        val wq = Window.partitionBy("q_id")
        val bm25 = tf
          .join(broadcast(qterms), "word")
          .filter(col("doc_id") =!= col("q_id"))
          .join(broadcast(df), "word")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("q_id"), col("doc_id"),
            (idf * (num.cast("double") / den)).as("term"),
            col("word"))
          .groupBy("q_id", "doc_id")
          .agg(array_sort(collect_list(struct(col("word"), col("term"))))
            .as("wt"))
          .select(col("q_id"), col("doc_id"),
            aggregate(transform(col("wt"), e => e.getField("term")),
              lit(0.0), (a, x) => a + x).as("score"))
          .withColumn("r_bm25", row_number().over(
            wq.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
          .filter(col("r_bm25") <= 20)
          .select("q_id", "doc_id", "r_bm25")
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val cos = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("doc_id"),
            call_function("cosine_sim", col("embedding"), col("q_emb"))
              .as("sim"))
          .withColumn("r_cos", row_number().over(
            wq.orderBy(col("sim").desc, col("doc_id").asc)).cast("long"))
          .filter(col("r_cos") <= 20)
          .select("q_id", "doc_id", "r_cos")
        bm25.join(cos, Seq("q_id", "doc_id"), "full_outer")
          .select(col("q_id"), col("doc_id"),
            coalesce(col("r_bm25"), lit(0L)).as("r_bm25"),
            coalesce(col("r_cos"), lit(0L)).as("r_cos"))
          .withColumn("rrf", expr("""
            (CASE WHEN r_bm25 = 0 THEN 0.0
              ELSE 1.0 / (60.0 + CAST(r_bm25 AS DOUBLE)) END)
            + (CASE WHEN r_cos = 0 THEN 0.0
              ELSE 1.0 / (60.0 + CAST(r_cos AS DOUBLE)) END)"""))
          .withColumn("fused_rank", row_number().over(
            wq.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
          .filter(col("fused_rank") <= 10)
          .select("q_id", "fused_rank", "doc_id", "r_bm25", "r_cos", "rrf")
          .orderBy("q_id", "fused_rank")
      },
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |                 (SELECT count(*) FROM t) AS n_tokens),
        |qterms AS (
        |  SELECT doc_id AS q_id, word FROM (
        |    SELECT doc_id, word, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf DESC, word ASC) AS rn
        |    FROM tf WHERE doc_id < 3) WHERE rn <= 3),
        |df AS (SELECT word, count(*) AS df FROM tf
        |       WHERE word IN (SELECT word FROM qterms) GROUP BY 1),
        |scored AS (
        |  SELECT q_id, tf.doc_id, word,
        |    ln((n_docs * 2 + 2)::DOUBLE / (df * 2 + 1)) *
        |    ((tf * 22 * n_tokens)::DOUBLE /
        |     (tf * 10 * n_tokens + 3 * n_tokens + 9 * dl * n_docs)) AS term
        |  FROM tf JOIN qterms USING (word) JOIN df USING (word)
        |    JOIN dl ON tf.doc_id = dl.doc_id, stats
        |  WHERE tf.doc_id <> q_id),
        |bm AS (
        |  SELECT q_id, doc_id,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(word := word, term := term))),
        |      e -> struct_extract(e, 'term'))), (a, b) -> a + b) AS score
        |  FROM scored GROUP BY 1, 2),
        |bmr AS (
        |  SELECT q_id, doc_id, rn AS r_bm25 FROM (
        |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, doc_id ASC) AS rn FROM bm) WHERE rn <= 20),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        |      WHERE vec_id < 3),
        |sims AS (SELECT q_id, e.vec_id AS doc_id,
        |    ${graft.functions.Similarity.cosineSql("e.embedding", "q.q_emb")} AS sim
        |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
        |cr AS (
        |  SELECT q_id, doc_id, rn AS r_cos FROM (
        |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, doc_id ASC) AS rn FROM sims) WHERE rn <= 20),
        |fused AS (
        |  SELECT coalesce(bmr.q_id, cr.q_id) AS q_id,
        |    coalesce(bmr.doc_id, cr.doc_id) AS doc_id,
        |    coalesce(r_bm25, 0)::BIGINT AS r_bm25,
        |    coalesce(r_cos, 0)::BIGINT AS r_cos,
        |    (CASE WHEN coalesce(r_bm25, 0) = 0 THEN 0.0
        |       ELSE 1.0 / (60.0 + coalesce(r_bm25, 0)::DOUBLE) END)
        |    + (CASE WHEN coalesce(r_cos, 0) = 0 THEN 0.0
        |       ELSE 1.0 / (60.0 + coalesce(r_cos, 0)::DOUBLE) END) AS rrf
        |  FROM bmr FULL OUTER JOIN cr
        |    ON bmr.q_id = cr.q_id AND bmr.doc_id = cr.doc_id)
        |SELECT q_id, fused_rank, doc_id, r_bm25, r_cos, rrf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY rrf DESC, doc_id ASC) AS fused_rank
        |  FROM fused) WHERE fused_rank <= 10
        |ORDER BY q_id, fused_rank""".stripMargin),
  )
}
