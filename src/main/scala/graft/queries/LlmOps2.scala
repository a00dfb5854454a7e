package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity
import graft.ops.TextAnalysis

/** Second LLM-pipeline batch: content scrubbing, latest-state compaction
  * (the upsert/merge read pattern), explicit skew-salted joins, and
  * sequential token packing for training batches. */
object LlmOps2 {

  val defs: Seq[QueryDef] = Seq(

    // Blocklist scrubbing — the redaction shape of a PII/toxicity filter
    // (word-boundary regex replace + hit count), as a pure narrow
    // projection: no shuffle, linear scan, same plan at any corpus size.
    QueryDef("q_text_scrub",
      (s, d) => {
        val pat = "\\b(customer|key|value)\\b"
        Tables.documents(s, d).select(
          col("doc_id"),
          regexp_count(col("text"), lit(pat)).cast("long").as("n_redacted"),
          md5(regexp_replace(col("text"), pat, "<x>").cast("binary")).as("scrubbed_md5"),
          (length(col("text")) - length(regexp_replace(col("text"), pat, "")))
            .cast("long").as("chars_removed"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
           len(regexp_extract_all(text, '\b(customer|key|value)\b'))::BIGINT AS n_redacted,
           md5(regexp_replace(text, '\b(customer|key|value)\b', '<x>', 'g')) AS scrubbed_md5,
           (length(text) - length(regexp_replace(text, '\b(customer|key|value)\b', '', 'g')))::BIGINT
             AS chars_removed
         FROM documents ORDER BY doc_id"""),

    // Latest-state compaction: one current row per user — the read side
    // of an upsert/merge (CDC) pipeline. Spark shape is a
    // partial-aggregating max_by on a (ts, event_id) composite (map-side
    // combine shrinks the shuffle to one row per key per mapper), NOT a
    // window: a row_number window would shuffle and sort every event.
    // The oracle states the same fixpoint with a window, proving the
    // aggregation formulation equivalent.
    QueryDef("q_upsert_latest",
      (s, d) => {
        val tsm = date_trunc("MILLISECOND", col("ts"))
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(max_by(
              struct(col("event_id"), tsm.as("tsm"), col("event_type"), col("value")),
              struct(tsm.as("o1"), col("event_id").as("o2"))).as("last"))
          .select(col("user_id"), col("last.event_id").as("last_event_id"),
            col("last.tsm").as("last_ts"), col("last.event_type").as("last_type"),
            col("last.value").as("last_value"))
          .orderBy("user_id")
      },
      """WITH e AS (SELECT user_id, event_id,
                    date_trunc('milliseconds', ts)::TIMESTAMP AS tsm,
                    event_type, value FROM events),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY tsm DESC, event_id DESC) AS rn FROM e)
         SELECT user_id, event_id AS last_event_id, tsm AS last_ts,
                event_type AS last_type, value AS last_value
         FROM r WHERE rn = 1 ORDER BY user_id"""),

    // Explicit salted fact-dim join: the dim side is replicated across 8
    // salt buckets and the fact side picks a deterministic salt, so one
    // hot join key spreads over 8 reducers instead of one — the manual
    // skew-mitigation pattern for when AQE's skew-join splitting can't
    // apply (e.g. aggregates above the join). Results provably identical
    // to the plain equi-join, which is exactly what the oracle runs.
    QueryDef("q_join_salted",
      (s, d) => {
        val nSalt = 8
        val fact = Tables.lineitem(s, d)
          .withColumn("salt", (col("l_partkey") + col("l_suppkey")) % nSalt)
        val dim = Tables.orders(s, d)
          .withColumn("salt", explode(array((0 until nSalt).map(lit): _*)))
        fact.join(dim,
            fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("o_totalprice"), col("o_orderstatus"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                o_totalprice, o_orderstatus
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),

    // Full KNN-graph construction: top-3 neighbors for EVERY vector (not
    // just 5 probes like q_similarity_topk) with sign-bucket LSH
    // candidates — the batch job that materializes the neighbor graph an
    // embedding-dedup or curation pipeline consumes. Σ bucket² candidate
    // pairs, per-source top-k via rank-limit window.
    QueryDef("q_knn_graph",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBucket(col("embedding"), 4))
        val a = e.select(col("vec_id").as("src"), col("embedding").as("emb_a"),
          col("bucket"))
        val b = e.select(col("vec_id").as("dst"), col("embedding").as("emb_b"),
          col("bucket"))
        val w = Window.partitionBy("src")
          .orderBy(col("cosine_sim").desc, col("dst").asc)
        a.join(b, Seq("bucket")).filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            call_function("cosine_sim", col("emb_a"), col("emb_b")).as("cosine_sim"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("src", "rn", "dst", "cosine_sim")
          .orderBy("src", "rn")
      },
      s"""WITH e AS (SELECT vec_id, embedding,
                 ${Similarity.signBucketSql("embedding", 4)}::BIGINT AS bucket
               FROM embeddings),
         p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                 ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cosine_sim
               FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY src
                 ORDER BY cosine_sim DESC, dst ASC) AS rn FROM p)
         SELECT src, rn, dst, cosine_sim FROM r WHERE rn <= 3
         ORDER BY src, rn"""),

    // Interval-overlap join: each error "impact window" [t, t+10 min]
    // matched with every same-user click window [t, t+5 min] it
    // intersects — ranges × ranges, the join shape point-in-band
    // (q_join_range) cannot express. Scale path: both sides quantized to
    // the bucket grid (Joins.intervalOverlapJoin), never a nested loop.
    QueryDef("q_join_interval",
      (s, d) => {
        val ev = Tables.events(s, d)
        val secs = unix_timestamp(date_trunc("SECOND", col("ts")))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"),
            secs.as("e_start"), (secs + 600).as("e_end"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            secs.as("c_start"), (secs + 300).as("c_end"))
        graft.ops.Joins.intervalOverlapJoin(
            errors, clicks.withColumnRenamed("c_user", "user_id"),
            Seq("user_id"), "e_start", "e_end", "c_start", "c_end", 600L)
          .select(col("user_id"), col("err_id"), col("click_id"),
            (least(col("e_end"), col("c_end"))
              - greatest(col("e_start"), col("c_start"))).as("overlap_s"))
          .orderBy("user_id", "err_id", "click_id")
      },
      """WITH e AS (SELECT user_id, event_id AS err_id,
                    epoch(date_trunc('second', ts))::BIGINT AS e_start,
                    epoch(date_trunc('second', ts))::BIGINT + 600 AS e_end
             FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id, event_id AS click_id,
                    epoch(date_trunc('second', ts))::BIGINT AS c_start,
                    epoch(date_trunc('second', ts))::BIGINT + 300 AS c_end
             FROM events WHERE event_type = 'click')
         SELECT e.user_id, err_id, click_id,
           (least(e_end, c_end) - greatest(e_start, c_start)) AS overlap_s
         FROM e JOIN c ON e.user_id = c.user_id
           AND e_start <= c_end AND c_start <= e_end
         ORDER BY e.user_id, err_id, click_id"""),

    // Cohort retention: users grouped by first-activity week, counted in
    // each subsequent week they remain active — the retention-matrix
    // aggregate next to funnel/session analysis. Integer weeks only, so
    // the oracle is exact by construction.
    QueryDef("q_cohort_retention",
      (s, d) => {
        val wk = to_date(date_trunc("week", col("ts")))
        val ev = Tables.events(s, d).select(col("user_id"), wk.as("week"))
        val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
        ev.distinct().join(cohort, "user_id")
          .select(col("cohort_week"),
            (datediff(col("week"), col("cohort_week")) / 7).cast("long")
              .as("week_offset"), col("user_id"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct("user_id").as("n_active"))
          // DATE → TIMESTAMP for the compare (repo rule: pandas renders
          // Spark DATE as date objects but DuckDB DATE as Timestamps)
          .select(col("cohort_week").cast("timestamp").as("cohort_week"),
            col("week_offset"), col("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH e AS (SELECT DISTINCT user_id,
                    date_trunc('week', ts)::DATE AS week FROM events),
         c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
         SELECT cohort_week::TIMESTAMP AS cohort_week,
           (datediff('day', cohort_week, week) // 7)::BIGINT AS week_offset,
           count(DISTINCT e.user_id) AS n_active
         FROM e JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""),

    // Ordered funnel analysis: signup → view → click → purchase, each
    // stage's first event strictly after the previous stage's. Four small
    // per-user aggregates chained by join (each output is one row per
    // user — AQE broadcasts them), NOT a single window over all events.
    QueryDef("q_funnel",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          date_trunc("MILLISECOND", col("ts")).as("tsm"), col("event_type"))
        val sgn = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("tsm").as("t_signup"))
        def firstAfter(typ: String, prev: org.apache.spark.sql.DataFrame,
                       prevCol: String, outCol: String) =
          ev.filter(col("event_type") === typ).join(prev, Seq("user_id"))
            .filter(col("tsm") > col(prevCol))
            .groupBy("user_id").agg(min("tsm").as(outCol))
        val vw = firstAfter("view", sgn, "t_signup", "t_view")
        val ck = firstAfter("click", vw, "t_view", "t_click")
        val pu = firstAfter("purchase", ck, "t_click", "t_purchase")
        val depth = Seq("t_signup", "t_view", "t_click", "t_purchase")
          .map(c => col(c).isNotNull.cast("long")).reduce(_ + _)
        ev.select("user_id").distinct()
          .join(sgn, Seq("user_id"), "left").join(vw, Seq("user_id"), "left")
          .join(ck, Seq("user_id"), "left").join(pu, Seq("user_id"), "left")
          .select(col("user_id"),
            col("t_signup").isNotNull.as("reached_signup"),
            col("t_view").isNotNull.as("reached_view"),
            col("t_click").isNotNull.as("reached_click"),
            col("t_purchase").isNotNull.as("reached_purchase"),
            depth.as("funnel_depth"))
          .orderBy("user_id")
      },
      """WITH e AS (SELECT user_id, date_trunc('milliseconds', ts)::TIMESTAMP AS tsm,
                    event_type FROM events),
         s AS (SELECT user_id, min(tsm) AS t_signup FROM e
               WHERE event_type = 'signup' GROUP BY 1),
         v AS (SELECT e.user_id, min(tsm) AS t_view FROM e JOIN s USING (user_id)
               WHERE event_type = 'view' AND tsm > t_signup GROUP BY 1),
         c AS (SELECT e.user_id, min(tsm) AS t_click FROM e JOIN v USING (user_id)
               WHERE event_type = 'click' AND tsm > t_view GROUP BY 1),
         p AS (SELECT e.user_id, min(tsm) AS t_purchase FROM e JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND tsm > t_click GROUP BY 1),
         b AS (SELECT DISTINCT user_id FROM e)
         SELECT b.user_id,
           t_signup IS NOT NULL AS reached_signup,
           t_view IS NOT NULL AS reached_view,
           t_click IS NOT NULL AS reached_click,
           t_purchase IS NOT NULL AS reached_purchase,
           ((t_signup IS NOT NULL)::BIGINT + (t_view IS NOT NULL)::BIGINT
            + (t_click IS NOT NULL)::BIGINT + (t_purchase IS NOT NULL)::BIGINT)
             AS funnel_depth
         FROM b LEFT JOIN s USING (user_id) LEFT JOIN v USING (user_id)
           LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         ORDER BY b.user_id"""),

    // Stratified reproducible sampling: per-language keep rates (the
    // corpus-rebalancing op of a multilingual training pipeline), driven
    // by the same multiplicative-hash trick as q_sample so the sample is
    // deterministic, engine-neutral, and stable under reruns — unlike
    // sampleBy/TABLESAMPLE, whose RNG draws are partitioning-dependent.
    QueryDef("q_sample_stratified",
      (s, d) => {
        val rate = when(col("lang") === "en", 80)
          .when(col("lang") === "de", 40)
          .otherwise(10)
        Tables.documents(s, d)
          .filter((col("doc_id") * 2654435761L) % 100 < rate)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"))
          .orderBy("lang")
      },
      """SELECT lang, count(*) AS n_sampled
         FROM documents
         WHERE (doc_id * 2654435761) % 100 <
           CASE WHEN lang = 'en' THEN 80 WHEN lang = 'de' THEN 40 ELSE 10 END
         GROUP BY lang ORDER BY lang"""),

    // SQL frontend: chained CTEs + window inside the CTE, planned by
    // Spark SQL over temp views (complements q_sql_subquery's correlated
    // EXISTS coverage).
    QueryDef("q_sql_cte",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_cte")
        Tables.customer(s, d).createOrReplaceTempView("customer_cte")
        s.sql("""
          WITH spend AS (
            SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders_cte GROUP BY o_custkey),
          ranked AS (
            SELECT c.c_custkey, c.c_name, s.total,
                   CAST(rank() OVER (ORDER BY s.total DESC, c.c_custkey) AS BIGINT) AS spend_rank
            FROM spend s JOIN customer_cte c ON s.o_custkey = c.c_custkey)
          SELECT c_custkey, c_name, total, spend_rank
          FROM ranked WHERE spend_rank <= 100 ORDER BY spend_rank""")
      },
      """WITH spend AS (
           SELECT o_custkey, (SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE AS total
           FROM orders GROUP BY o_custkey),
         ranked AS (
           SELECT c.c_custkey, c.c_name, s.total,
                  rank() OVER (ORDER BY s.total DESC, c.c_custkey) AS spend_rank
           FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey)
         SELECT c_custkey, c_name, total, spend_rank
         FROM ranked WHERE spend_rank <= 100 ORDER BY spend_rank"""),

    // Domain-mixture weights: per-source token shares and the resampling
    // weight needed to hit a uniform target mixture — the data-mixing
    // computation behind pretraining corpus recipes. Exact arithmetic:
    // token counts stay integers; shares/weights are single exact double
    // divisions of those integers on both engines.
    QueryDef("q_mix_weights",
      (s, d) => {
        val perSource = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        val totals = perSource.agg(sum("n_tokens").as("total_tokens"),
          count(lit(1)).as("n_sources"))
        perSource.crossJoin(broadcast(totals))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (col("n_tokens").cast("double") / col("total_tokens")).as("actual_share"),
            ((col("total_tokens").cast("double") / col("n_sources"))
              / col("n_tokens")).as("uniform_weight"))
          .orderBy("source")
      },
      """WITH s AS (SELECT source, count(*) AS n_docs,
                    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
             FROM documents GROUP BY source),
         t AS (SELECT sum(n_tokens)::BIGINT AS total_tokens, count(*) AS n_sources FROM s)
         SELECT source, n_docs, n_tokens,
           n_tokens::DOUBLE / total_tokens AS actual_share,
           (total_tokens::DOUBLE / n_sources) / n_tokens AS uniform_weight
         FROM s, t ORDER BY source"""),

    // Epoch materialization of the mixture: each document repeats
    // ceil(its source's uniform-target resampling weight) times — the
    // integer "repetition factor" realization of q_mix_weights that a
    // training run actually consumes. The per-source factor table is
    // tiny (one row per source) and broadcast; the explode is
    // partition-local, so the epoch dataset is produced with ZERO
    // shuffles of the corpus itself.
    QueryDef("q_mix_materialize",
      (s, d) => {
        val perSource = Tables.documents(s, d)
          .groupBy("source")
          .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        val totals = perSource.agg(sum("n_tokens").as("total_tokens"),
          count(lit(1)).as("n_sources"))
        val factors = perSource.crossJoin(broadcast(totals))
          .select(col("source"),
            ceil((col("total_tokens").cast("double") / col("n_sources"))
              / col("n_tokens")).cast("int").as("factor"))
        Tables.documents(s, d).select("doc_id", "source")
          .join(broadcast(factors), "source")
          .select(col("doc_id"), col("source"), col("factor"),
            explode(sequence(lit(1), col("factor"))).as("copy"))
          .orderBy("doc_id", "copy")
      },
      """WITH s AS (SELECT source,
                    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
             FROM documents GROUP BY source),
         t AS (SELECT sum(n_tokens)::BIGINT AS total_tokens, count(*) AS n_sources FROM s),
         f AS (SELECT source,
                 ceil((total_tokens::DOUBLE / n_sources) / n_tokens)::INTEGER AS factor
               FROM s, t)
         SELECT d.doc_id, d.source, f.factor,
           unnest(generate_series(1, f.factor))::INTEGER AS copy
         FROM documents d JOIN f USING (source)
         ORDER BY doc_id, copy"""),

    // Benchmark decontamination: flag training docs sharing any word
    // trigram with a benchmark/eval set (stand-in: doc_id < 20) — the
    // n-gram-overlap contamination check every pretraining pipeline runs.
    // Shape: explode distinct trigrams, equi-join on the trigram (the
    // benchmark side is tiny → AQE broadcasts; at 100 TB the join is a
    // shuffle on the trigram key, never pairwise doc×doc), count shared
    // trigram TYPES per contaminated doc.
    QueryDef("q_decontaminate",
      (s, d) => {
        val ws = split(col("text"), " ")
        // trigrams reduce to 8-byte xxhash64 digests BEFORE the explode:
        // the result is a count of shared trigram TYPES, so any
        // collision-free identity key gives the same answer (the ≤31³
        // possible trigrams of this corpus put a collision at ~2e-11 —
        // the same digest-identity argument minHashPairs rests on), and
        // digests shrink the checkpointed/joined/distinct'd rows ~3×
        // vs 18-char trigram strings. The oracle keeps joining the
        // strings themselves — algorithm-independent fixpoint.
        // zip_with/slice construction: short-doc-safe, no trigram string
        // or index array allocated (see TextAnalysis.trigramDigests).
        val tri = TextAnalysis.trigramDigests(ws)
        // lazy checkpoint: docTris feeds both the benchmark side and the
        // training side — without it the trigram construction runs twice
        val docTris = Tables.documents(s, d)
          .select(col("doc_id"), explode(array_distinct(tri)).as("tg"))
          .localCheckpoint(eager = false)
        val bench = docTris.filter(col("doc_id") < 20).select("tg").distinct()
        docTris.filter(col("doc_id") >= 20)
          .join(bench, "tg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared_trigrams"))
          .orderBy("doc_id")
      },
      """WITH tris AS (
           SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1] || ' ' ||
                    string_split(text, ' ')[i+2]))) AS tg
           FROM documents),
         bench AS (SELECT DISTINCT tg FROM tris WHERE doc_id < 20)
         SELECT doc_id, count(*) AS n_shared_trigrams
         FROM tris JOIN bench USING (tg)
         WHERE doc_id >= 20
         GROUP BY doc_id ORDER BY doc_id"""),

    // TF-IDF weighting — the classic sparse text-feature transform. The
    // idf log runs through the custom LnIeee expression (Math.log
    // intrinsic) because Spark's built-in log uses StrictMath, which
    // differs from the correctly-rounded glibc/DuckDB ln by 1-2 ulp —
    // with the intrinsic, scores are verified bit-identical across all
    // (N, df) pairs this corpus produces at every SF. Corpus size N rides
    // a broadcast single-row aggregate, df a shuffled word join.
    QueryDef("q_text_tfidf",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val docs = Tables.documents(s, d)
        val tokens = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        val tf = tokens.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val dfreq = tokens.select("doc_id", "word").distinct()
          .groupBy("word").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        tf.join(dfreq, "word").crossJoin(broadcast(n))
          .select(col("doc_id"), col("word"), col("tf"),
            (col("tf") * call_function("ln_ieee",
              col("n").cast("double") / col("df"))).as("tfidf"))
          .orderBy("doc_id", "word")
      },
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
         df AS (SELECT word, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents)
         SELECT doc_id, word, tf, tf * ln(n::DOUBLE / df) AS tfidf
         FROM tf JOIN df USING (word), n ORDER BY doc_id, word"""),

    // Unigram-LM negative log-likelihood per document — the
    // perplexity-proxy quality filter: docs made of globally-rare tokens
    // score high, boilerplate scores low. nll = -(Σ tf_w·ln p_corpus(w))/n.
    // Same determinism recipe as q_text_entropy: per-row exact terms,
    // word-sorted left fold, LnIeee intrinsic log.
    QueryDef("q_text_unigram_nll",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val tokens = Tables.documents(s, d).select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        val tf = tokens.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val corpus = tokens.groupBy("word").agg(count(lit(1)).as("cnt"))
        val total = tokens.agg(count(lit(1)).as("total"))
        val terms = tf.join(corpus, "word").crossJoin(broadcast(total))
          .select(col("doc_id"), col("word"), col("tf"),
            (col("tf") * call_function("ln_ieee",
              col("cnt").cast("double") / col("total").cast("double"))).as("term"))
        terms.groupBy("doc_id")
          .agg(sum("tf").as("n"),
            array_sort(collect_list(struct(col("word"), col("term")))).as("wt"))
          .select(col("doc_id"), col("n"),
            (lit(-1.0) * aggregate(
              transform(col("wt"), e => e.getField("term")),
              lit(0.0), (acc, x) => acc + x) / col("n").cast("double")).as("nll"))
          .orderBy("doc_id")
      },
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
         corpus AS (SELECT word, count(*) AS cnt FROM t GROUP BY 1),
         total AS (SELECT count(*) AS total FROM t),
         terms AS (SELECT doc_id, word, tf,
                     tf * ln(cnt::DOUBLE / total::DOUBLE) AS term
                   FROM tf JOIN corpus USING (word), total),
         d AS (SELECT doc_id, sum(tf) AS n,
                 list_sort(list(struct_pack(word := word, term := term))) AS wt
               FROM terms GROUP BY 1)
         SELECT doc_id, n::BIGINT AS n,
           -1.0 * list_reduce(list_prepend(0.0,
             list_transform(wt, e -> struct_extract(e, 'term'))),
             (a, b) -> a + b) / n AS nll
         FROM d ORDER BY doc_id"""),

    // Shannon entropy of each document's word distribution — the
    // repetitiveness/diversity quality signal. Determinism: the
    // (word, tf) pairs are sorted before a LEFT-TO-RIGHT p·ln(p) fold
    // (double addition is order-sensitive), and ln runs through LnIeee so
    // both engines produce bit-identical terms (verified over all 1727
    // distinct tf/n ratios this corpus yields).
    QueryDef("q_text_entropy",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val tokens = Tables.documents(s, d).select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        val tf = tokens.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        tf.groupBy("doc_id").agg(
            sum("tf").as("n"),
            array_sort(collect_list(struct(col("word"), col("tf")))).as("wc"))
          .select(col("doc_id"), col("n"),
            (lit(-1.0) * aggregate(
              transform(col("wc"), e => {
                val p = e.getField("tf").cast("double") / col("n").cast("double")
                p * call_function("ln_ieee", p)
              }),
              lit(0.0), (acc, x) => acc + x)).as("entropy"))
          .orderBy("doc_id")
      },
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
         d AS (SELECT doc_id, sum(tf) AS n,
                 list_sort(list(struct_pack(word := word, tf := tf))) AS wc
               FROM tf GROUP BY 1)
         SELECT doc_id, n::BIGINT AS n,
           -1.0 * list_reduce(list_prepend(0.0, list_transform(wc,
             e -> (struct_extract(e, 'tf')::DOUBLE / n)
                  * ln(struct_extract(e, 'tf')::DOUBLE / n))),
             (a, b) -> a + b) AS entropy
         FROM d ORDER BY doc_id"""),

    // Language-ID evaluation: labeled × predicted confusion counts — the
    // quality-eval aggregate for the classifier behind q_text_langid.
    QueryDef("q_langid_confusion",
      (s, d) => Tables.documents(s, d)
        .select(col("lang").as("labeled"),
          graft.ops.TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy("labeled", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("labeled", "predicted"),
      s"""SELECT lang AS labeled, ${graft.ops.TextAnalysis.langIdSql("text")} AS predicted,
           count(*) AS n
         FROM documents GROUP BY 1, 2 ORDER BY labeled, predicted"""),

    // Multimodal feature extraction: a 16-bin byte-value histogram over
    // the payload, normalized to a float feature vector — a real
    // extractor (not a stub): histogram features are what cheap
    // image/audio fingerprinting actually computes. Pure narrow
    // projection; the vector is rendered via the standard floor(x·10⁶)
    // CSV (driver compare cannot hash arrays). Bytes == chars for this
    // ASCII corpus, so DuckDB mirrors via ascii(substring(...)).
    //
    // Perf shape (round 8, exposed the moment Bench stopped pruning
    // projections): codes come from ONE char-split pass (O(L) per doc —
    // the earlier substr(text, i, 1)-per-index build was O(L²)), and an
    // inline() Generate barrier pins the array to one evaluation; without
    // it CollapseProject re-inlines the construction into every one of
    // the 18 consuming expressions (16 bins + sum + csv) — the same
    // multi-reference trap as the parser's from_csv. 26.9 s → ~3 s at
    // sf0.1.
    QueryDef("q_multimodal_features",
      (s, d) => {
        val codes0 = transform(split(col("text"), ""),
          c => floor(ascii(c).cast("double") / 16).cast("int"))
        val base = Tables.documents(s, d).select(
          col("doc_id"), length(col("text")).as("n"),
          inline(array(struct(codes0.as("codes")))))
        val n = col("n")
        val hist = (0 until 16).map(b =>
          size(filter(col("codes"), c => c === b)).cast("double") / n.cast("double"))
        val featCsv = concat_ws(",", hist.map(h =>
          floor(h * 1000000d).cast("string")): _*)
        base.select(
          col("doc_id"),
          n.cast("long").as("n_bytes"),
          aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
          featCsv.as("features_csv"))
          .orderBy("doc_id")
      },
      s"""WITH c AS (
           SELECT doc_id, length(text) AS n,
             list_transform(range(1, length(text) + 1),
               i -> (ascii(substring(text, i, 1)) // 16)) AS codes
           FROM documents)
         SELECT doc_id, n::BIGINT AS n_bytes,
           list_reduce(list_prepend(0::BIGINT, list_transform(codes, x -> x::BIGINT)),
             (a, b) -> a + b) AS code_sum,
           ${(0 until 16).map(b =>
             s"CAST(floor(len(list_filter(codes, x -> x = $b))::DOUBLE / n * 1000000.0) AS BIGINT)::VARCHAR")
             .mkString(" || ',' || ")} AS features_csv
         FROM c ORDER BY doc_id"""),

    // Semi-join reducer: when a selective dimension filter exists but the
    // dim is too big to broadcast whole, broadcast its DISTINCT KEYS as a
    // semi-join to prune the fact BEFORE the wide shuffle — only matching
    // fact rows shuffle for the real join. Provably identical to the
    // direct join (the semi-join filters exactly the rows the inner join
    // would keep), which is what the oracle runs.
    QueryDef("q_join_prefiltered",
      (s, d) => {
        val dim = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        val dimKeys = dim.select("o_orderkey").distinct()
        val fact = Tables.lineitem(s, d)
          .join(dimKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
        fact.join(dim, col("l_orderkey") === dim("o_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("o_totalprice"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, o_totalprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),

    // Multiple COUNT(DISTINCT <different columns>) in one aggregation —
    // Spark plans this through an Expand node (one replicated stream per
    // distinct set) with partial aggregation on each.
    QueryDef("q_agg_multidistinct",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          countDistinct(col("o_orderpriority")).as("n_priorities"),
          countDistinct(year(col("o_orderdate"))).as("n_years"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(DISTINCT year(o_orderdate)) AS n_years,
           count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    // End-to-end curation pipeline COMPOSED from the library's own ops:
    // exact-dedup (keep min doc_id per content) → quality gate → per-lang
    // sequential token packing. One lazy plan end to end — Catalyst fuses
    // the dedup aggregate, the quality projection, and the pack window;
    // nothing materializes between stages. The oracle chains the same
    // three stages as CTEs.
    QueryDef("q_curation_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keep = graft.ops.Dedup.exact(docs, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val scored = docs.join(keep, Seq("doc_id"))
          .select(col("doc_id"), col("lang"),
            graft.ops.TextAnalysis.qualityScore(col("text")).as("quality_score"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .filter(col("quality_score") >= 0.3)
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        scored
          .withColumn("tokens_before", coalesce(sum("n_tokens").over(w), lit(0L)))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            (col("tokens_before") / 512).cast("long").as("batch_id"))
          .orderBy("doc_id")
      },
      """WITH keep AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         scored AS (
           SELECT d.doc_id, d.lang,
             least(1.0, len(string_split(text, ' '))::DOUBLE / 100.0)
               * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                  / len(string_split(text, ' '))) AS quality_score,
             len(string_split(text, ' '))::BIGINT AS n_tokens
           FROM documents d JOIN keep USING (doc_id)),
         gated AS (SELECT * FROM scored WHERE quality_score >= 0.3),
         packed AS (
           SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS tokens_before FROM gated)
         SELECT doc_id, lang, n_tokens, (tokens_before // 512)::BIGINT AS batch_id
         FROM packed ORDER BY doc_id"""),

    // Moving median: exact interpolated percentile as a WINDOW aggregate
    // (verified bit-equal to DuckDB quantile_cont) over a row frame.
    QueryDef("q_window_median",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(-2, 0)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          percentile(col("o_totalprice"), lit(0.5)).over(w).as("moving_median"),
          count(lit(1)).over(w).as("n_in_frame"))
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey, o_totalprice,
           quantile_cont(o_totalprice, 0.5) OVER w AS moving_median,
           count(*) OVER w AS n_in_frame
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey"""),

    // Sequential token packing: fill 512-token training batches per
    // language in doc_id order — batch id = tokens-before / budget. One
    // window cumsum per language partition; integer arithmetic only, so
    // the oracle matches exactly. (True bin-packing is NP-hard and
    // order-dependent; sequential fill is what streaming batch packers
    // actually do.)
    QueryDef("q_pack_batches",
      (s, d) => {
        val budget = 512
        val nTokens = size(split(col("text"), " ")).cast("long")
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), nTokens.as("n_tokens"))
          .withColumn("tokens_before", coalesce(sum("n_tokens").over(w), lit(0L)))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            (col("tokens_before") / budget).cast("long").as("batch_id"))
          .orderBy("doc_id")
      },
      """WITH t AS (SELECT doc_id, lang,
                    len(string_split(text, ' '))::BIGINT AS n_tokens
             FROM documents),
         c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS tokens_before FROM t)
         SELECT doc_id, lang, n_tokens, (tokens_before // 512)::BIGINT AS batch_id
         FROM c ORDER BY doc_id"""),
  )
}
