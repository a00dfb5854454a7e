package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sharded

/** Round-11 batch 29: Heaps' law fit (V = K·nᵝ — the vocabulary-growth
  * exponent that predicts how much NEW vocabulary more data buys) and
  * rank-biased overlap (RBO — the top-weighted agreement measure
  * between two rankings, here full cosine vs an 8-dim sketch
  * retriever).
  *
  * Scale shapes: Heaps' cumulative (tokens, vocab) curves run through
  * Sharded prefix sums (doc-id shards — the q_vocab_growth pattern);
  * the log–log OLS reduces the corpus-sized point set with ONE
  * combinable DECIMAL fixed-point moment aggregate. RBO works on two
  * 10-element ranking arrays per query — all in-row, with p-weights
  * built by position-ordered multiplicative folds (no pow()).
  */
object Round11Ops29 {

  val defs: Seq[QueryDef] = Seq(

    // Heaps' law: for each doc (in doc_id order) the cumulative token
    // count n_t and cumulative vocabulary V_t (first-occurrence words),
    // then the OLS fit of ln V on ln n. Both ln's go through LnIeee and
    // land in micro fixed point (floor(ln·1e12)) so the five moments
    // are exact DECIMAL sums — order-free at any corpus size.
    QueryDef("q_text_heaps",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        def ln(c: org.apache.spark.sql.Column) = call_function("ln_ieee", c)
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
              .as("word"))
        val perDoc = toks.groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_toks"))
        val newWords = toks.groupBy("word").agg(min("doc_id").as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).cast("long").as("n_new"))
        val frame = perDoc.join(newWords, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_toks"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
        val cx = Sharded.globalPrefixSum(frame, expr("doc_id div 64"),
          Seq(col("doc_id")), col("n_toks"), "cx_before")
        val both = Sharded.globalPrefixSum(cx, expr("doc_id div 64"),
            Seq(col("doc_id")), col("n_new"), "cy_before")
          .select(col("doc_id"),
            (col("cx_before") + col("n_toks")).as("cum_toks"),
            (col("cy_before") + col("n_new")).as("cum_vocab"))
          .filter(col("cum_vocab") > 0 && col("cum_toks") > 0)
          .select(
            floor(ln(col("cum_toks").cast("double")) * lit(1e12))
              .cast("long").as("lx"),
            floor(ln(col("cum_vocab").cast("double")) * lit(1e12))
              .cast("long").as("ly"))
        both.agg(count(lit(1)).cast("long").as("n"),
            sum(col("lx").cast("decimal(38,0)")).as("sx"),
            sum(col("ly").cast("decimal(38,0)")).as("sy"),
            sum(col("lx").cast("decimal(19,0)")
              * col("lx").cast("decimal(19,0)")).as("sxx"),
            sum(col("lx").cast("decimal(19,0)")
              * col("ly").cast("decimal(19,0)")).as("sxy"))
          .select(col("n"), col("sx"), col("sy"),
            expr("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))""").as("beta"))
          .withColumn("ln_k",
            expr("""(CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
              / CAST(n AS DOUBLE) / 1e12"""))
          .select(col("n"), col("beta"), col("ln_k"))
      },
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS word
        |  FROM documents),
        |per_doc AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_toks FROM toks GROUP BY 1),
        |new_words AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_new FROM (
        |    SELECT word, min(doc_id) AS doc_id FROM toks GROUP BY 1)
        |  GROUP BY 1),
        |frame AS (
        |  SELECT p.doc_id, n_toks, coalesce(n_new, 0)::BIGINT AS n_new
        |  FROM per_doc p LEFT JOIN new_words n ON p.doc_id = n.doc_id),
        |cums AS (
        |  SELECT doc_id,
        |    sum(n_toks) OVER w AS cum_toks,
        |    sum(n_new) OVER w AS cum_vocab
        |  FROM frame
        |  WINDOW w AS (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pts AS (
        |  SELECT floor(ln(cum_toks::DOUBLE) * 1e12)::BIGINT AS lx,
        |    floor(ln(cum_vocab::DOUBLE) * 1e12)::BIGINT AS ly
        |  FROM cums WHERE cum_vocab > 0 AND cum_toks > 0),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(lx) AS sx, sum(ly) AS sy,
        |    sum(lx::HUGEINT * lx::HUGEINT) AS sxx,
        |    sum(lx::HUGEINT * ly::HUGEINT) AS sxy
        |  FROM pts)
        |SELECT n,
        |  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS beta,
        |  (sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
        |    * sx::DOUBLE) / n::DOUBLE / 1e12 AS ln_k
        |FROM m""".stripMargin),

    // Rank-biased overlap (p = 0.9, truncated at depth 10) between the
    // full-cosine ranking and a deliberately cheaper 8-dim sketch
    // ranking for 3 query vectors — the eval that says how much two
    // retrievers agree WHERE IT MATTERS (top-weighted). Per (query, depth): prefix overlap,
    // agreement, and the (1−p)·p^{d−1}·A_d term with p^{d−1} built by
    // a position-ordered multiplicative fold; depth-0 summary row
    // carries the truncated RBO sum.
    QueryDef("q_similarity_rbo",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wq = Window.partitionBy("q_id")
        def topList(df: org.apache.spark.sql.DataFrame, score: String) = df
          .withColumn("rn", row_number().over(
            wq.orderBy(col(score).desc, col("doc_id").asc)).cast("long"))
          .filter(col("rn") <= 10)
          .groupBy("q_id")
          .agg(array_sort(collect_list(struct(col("rn"), col("doc_id"))))
            .as("tl"))
          .select(col("q_id"),
            expr("transform(tl, e -> e.doc_id)").as("ids"))
        val cosL = topList(
          e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("doc_id"),
              call_function("cosine_sim", col("embedding"), col("q_emb"))
                .as("sim")), "sim")
        // second ranking: distance on the FIRST 8 dims only (a cheap
        // "sketch retriever") — deliberately different from full cosine
        val cos8 = topList(
          e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("doc_id"),
              expr("""aggregate(zip_with(slice(embedding, 1, 8),
                  slice(q_emb, 1, 8),
                  (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
                0.0D, (acc, x) -> acc + x)""").as("sim")), "sim")
        val terms = cosL.withColumnRenamed("ids", "a")
          .join(cos8.withColumnRenamed("ids", "b"), "q_id")
          .select(col("q_id"), col("a"), col("b"),
            explode(sequence(lit(1L), lit(10L))).as("depth"))
          .select(col("q_id"), col("depth"),
            size(array_intersect(
              slice(col("a"), lit(1), col("depth").cast("int")),
              slice(col("b"), lit(1), col("depth").cast("int"))))
              .cast("long").as("overlap"))
          .withColumn("agreement",
            col("overlap").cast("double") / col("depth").cast("double"))
          .withColumn("pw",
            expr("""CASE WHEN depth < 2 THEN 1.0D
              ELSE aggregate(sequence(2, CAST(depth AS INT)), 1.0D,
                (acc, i) -> acc * 0.9D) END"""))
          .withColumn("rbo_term", lit(0.1) * col("pw") * col("agreement"))
        val summary = terms.groupBy("q_id")
          .agg(array_sort(collect_list(struct(col("depth"),
            col("rbo_term").as("t")))).as("ts"))
          .select(col("q_id"), lit(0L).as("depth"), lit(0L).as("overlap"),
            lit(0.0).as("agreement"), lit(0.0).as("pw"),
            aggregate(transform(col("ts"), e => e.getField("t")),
              lit(0.0), (acc, x) => acc + x).as("rbo_term"))
        terms.select("q_id", "depth", "overlap", "agreement", "pw", "rbo_term")
          .unionAll(summary)
          .orderBy("q_id", "depth")
      },
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 3),
        |cosr AS (
        |  SELECT q_id, e.vec_id AS doc_id,
        |    ${graft.functions.Similarity.cosineSql("e.embedding", "q.q_emb")}
        |      AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |al AS (
        |  SELECT q_id, list(doc_id ORDER BY rn) AS a FROM (
        |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, doc_id ASC) AS rn FROM cosr) WHERE rn <= 10
        |  GROUP BY 1),
        |c8 AS (
        |  SELECT q_id, e.vec_id AS doc_id,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |      i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE)),
        |      (acc, x) -> acc + x) AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |bl AS (
        |  SELECT q_id, list(doc_id ORDER BY rn) AS b FROM (
        |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, doc_id ASC) AS rn FROM c8) WHERE rn <= 10
        |  GROUP BY 1),
        |terms AS (
        |  SELECT q_id, depth,
        |    len(list_intersect(a[1:depth], b[1:depth]))::BIGINT AS overlap,
        |    len(list_intersect(a[1:depth], b[1:depth]))::DOUBLE
        |      / depth::DOUBLE AS agreement,
        |    list_reduce(list_prepend(1.0::DOUBLE,
        |      list_transform(range(2, depth + 1), i -> 0.9::DOUBLE)),
        |      (acc, x) -> acc * x) AS pw
        |  FROM al JOIN bl USING (q_id),
        |    (SELECT unnest(range(1, 11))::BIGINT AS depth)),
        |full_terms AS (
        |  SELECT q_id, depth, overlap, agreement, pw,
        |    0.1::DOUBLE * pw * agreement AS rbo_term
        |  FROM terms),
        |summary AS (
        |  SELECT q_id, 0::BIGINT AS depth, 0::BIGINT AS overlap,
        |    0.0 AS agreement, 0.0 AS pw,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(depth := depth, t := rbo_term))),
        |      e -> struct_extract(e, 't'))), (x, y) -> x + y) AS rbo_term
        |  FROM full_terms GROUP BY q_id)
        |SELECT q_id, depth, overlap, agreement, pw, rbo_term FROM full_terms
        |UNION ALL SELECT q_id, depth, overlap, agreement, pw, rbo_term
        |FROM summary
        |ORDER BY q_id, depth""".stripMargin),
  )
}
