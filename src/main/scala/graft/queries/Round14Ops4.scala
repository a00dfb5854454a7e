package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 batch 4: the training-pipeline vocabulary-coverage readout
  * (train/eval OOV), the Mann-Kendall trend TEST (the significance
  * companion to q_stats_theilsen's slope ESTIMATE), and experiment
  * design (minimum detectable effect / power for the two-proportion
  * test q_events_abtest runs after the fact).
  */
object Round14Ops4 {

  val defs: Seq[QueryDef] = Seq(

    // Train/eval out-of-vocabulary rate — the tokenizer-coverage check
    // every pretraining pipeline runs before a vocab freeze: split the
    // corpus deterministically (doc_id % 5: fold 0 = eval, rest =
    // train), build the train vocabulary, and measure what fraction of
    // eval TOKENS (occurrence-weighted) and eval TYPES (distinct words)
    // fall outside it, per source.
    //
    // Scale shape: the eval-tokens ⋈ train-vocab join keys on `word`,
    // and real vocabularies are Zipf — the q_text_tfidf_skewsafe skew:
    // the head word alone would route a constant fraction of ALL eval
    // occurrences to one reducer. Same fix: the top-H train words by
    // occurrence count (H=8 here, ~1e5 in production; the head covers
    // most token mass) broadcast, so every hot key bypasses the shuffle;
    // only the long tail — per-key counts bounded by construction —
    // takes the shuffled left join (an anti-split of the vocab via one
    // broadcast left-anti). The oracle states the SEMANTICS (plain IN
    // vocab) — the head/tail split is a plan property the hash gate
    // proves output-neutral. oov_rate/type_oov_rate are each one IEEE
    // division of exact BIGINTs.
    QueryDef("q_text_oov",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tokens = docs.select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("word"))
        val train = tokens.filter(col("doc_id") % 5 =!= 0)
        val vocabCounts = train.groupBy("word").agg(count(lit(1)).as("tf"))
        val head = vocabCounts
          .orderBy(col("tf").desc, col("word").asc).limit(8)
          .select("word")
        val tailVocab = vocabCounts.join(broadcast(head), Seq("word"),
          "left_anti").select(col("word"), lit(1).as("in_tail"))
        val eval_ = tokens.filter(col("doc_id") % 5 === 0)
          .join(broadcast(head.withColumn("in_head", lit(1))),
            Seq("word"), "left")
        // head-matched tokens NEVER enter the shuffled join — that is
        // the whole point of the split (the hot keys ride the broadcast)
        val headHit = eval_.filter(col("in_head") === 1)
          .select(col("source"), col("doc_id"), col("word"),
            lit(0L).as("oov"))
        val flagged = eval_.filter(col("in_head").isNull)
          .join(tailVocab, Seq("word"), "left")
          .select(col("source"), col("doc_id"), col("word"),
            col("in_tail").isNull.cast("long").as("oov"))
          .unionByName(headHit)
        flagged.groupBy("source")
          .agg(countDistinct("doc_id").as("n_docs"),
            count(lit(1)).as("n_tokens"),
            sum("oov").as("n_oov"),
            countDistinct("word").as("n_types"),
            countDistinct(when(col("oov") === 1, col("word"))).as("n_oov_types"))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("n_oov"),
            (col("n_oov").cast("double") / col("n_tokens").cast("double"))
              .as("oov_rate"),
            col("n_types"), col("n_oov_types"),
            (col("n_oov_types").cast("double") / col("n_types").cast("double"))
              .as("type_oov_rate"))
          .orderBy("source")
      },
      """WITH t AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |vocab AS (SELECT DISTINCT word FROM t WHERE doc_id % 5 <> 0),
        |ev AS (
        |  SELECT source, doc_id, t.word,
        |    CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM t LEFT JOIN vocab v ON t.word = v.word
        |  WHERE doc_id % 5 = 0)
        |SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  count(*)::BIGINT AS n_tokens, sum(oov)::BIGINT AS n_oov,
        |  sum(oov)::DOUBLE / count(*)::DOUBLE AS oov_rate,
        |  count(DISTINCT word)::BIGINT AS n_types,
        |  count(DISTINCT CASE WHEN oov = 1 THEN word END)::BIGINT
        |    AS n_oov_types,
        |  count(DISTINCT CASE WHEN oov = 1 THEN word END)::DOUBLE
        |    / count(DISTINCT word)::DOUBLE AS type_oov_rate
        |FROM ev GROUP BY source ORDER BY source""".stripMargin),

    // Mann-Kendall trend test over daily event volume — the
    // SIGNIFICANCE companion to q_stats_theilsen (which estimates the
    // slope but not whether it beats chance): S = Σ_{i<j} sign(x_j−x_i)
    // with the tie-corrected variance
    //   Var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18
    // and the continuity-corrected z. S, both variance numerators, and
    // the tie table are exact BIGINTs; z is one float chain (div of a
    // sub by a sqrt of one division) written identically on both
    // engines.
    //
    // Scale shape: ONE map-side-combined fact groupBy(day); the i<j
    // pair frame is the CALENDAR-bounded day series squared (|days|² —
    // ~1e7 rows for a decade of days, independent of corpus size), and
    // the tie table is value-bounded. Nothing downstream of the first
    // aggregate scales with the data.
    QueryDef("q_stats_mannkendall",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .groupBy("day").agg(count(lit(1)).as("x"))
        val pairs = daily.as("a").join(daily.as("b"),
            col("b.day") > col("a.day"))
          .select(signum(col("b.x") - col("a.x")).cast("long").as("sgn"))
        val sAgg = pairs.agg(sum("sgn").as("s_stat"))
        val nAgg = daily.agg(count(lit(1)).as("n"))
        val ties = daily.groupBy("x").agg(count(lit(1)).as("t"))
          .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
            .as("tie_term"))
        sAgg.crossJoin(nAgg).crossJoin(ties)
          .select(col("n"), col("s_stat"),
            ((col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
              coalesce(col("tie_term"), lit(0L))).cast("double") / lit(18.0))
              .as("var_s"))
          .withColumn("z", when(col("s_stat") > 0,
              (col("s_stat") - lit(1)).cast("double") / sqrt(col("var_s")))
            .when(col("s_stat") < 0,
              (col("s_stat") + lit(1)).cast("double") / sqrt(col("var_s")))
            .otherwise(lit(0.0)))
          .withColumn("trend",
            when(col("z") > 1.959963984540054, lit("increasing"))
              .when(col("z") < -1.959963984540054, lit("decreasing"))
              .otherwise(lit("none")))
          .select("n", "s_stat", "var_s", "z", "trend")
      },
      """WITH daily AS (
        |  SELECT floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
        |         count(*)::BIGINT AS x
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT sum(CASE WHEN b.x > a.x THEN 1
        |             WHEN b.x < a.x THEN -1 ELSE 0 END)::BIGINT AS s_stat
        |  FROM daily a JOIN daily b ON b.day > a.day),
        |nn AS (SELECT count(*)::BIGINT AS n FROM daily),
        |ties AS (
        |  SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
        |  FROM (SELECT x, count(*)::BIGINT AS t FROM daily GROUP BY x)),
        |v AS (
        |  SELECT n, s_stat,
        |    (n * (n - 1) * (2 * n + 5) - coalesce(tie_term, 0))::DOUBLE / 18.0
        |      AS var_s
        |  FROM s, nn, ties)
        |SELECT n, s_stat, var_s,
        |  CASE WHEN s_stat > 0 THEN (s_stat - 1)::DOUBLE / sqrt(var_s)
        |       WHEN s_stat < 0 THEN (s_stat + 1)::DOUBLE / sqrt(var_s)
        |       ELSE 0.0 END AS z,
        |  CASE WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1)::DOUBLE / sqrt(var_s)
        |                  WHEN s_stat < 0 THEN (s_stat + 1)::DOUBLE / sqrt(var_s)
        |                  ELSE 0.0 END) > 1.959963984540054 THEN 'increasing'
        |       WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1)::DOUBLE / sqrt(var_s)
        |                  WHEN s_stat < 0 THEN (s_stat + 1)::DOUBLE / sqrt(var_s)
        |                  ELSE 0.0 END) < -1.959963984540054 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM v""".stripMargin),

    // Two-proportion experiment DESIGN readout: observed z, minimum
    // detectable effect at α=0.05 / power 0.8, and whether the observed
    // lift clears the MDE — the "was this test even big enough" check
    // that belongs BEFORE q_events_abtest's post-hoc significance.
    // Variants by user_id parity, conversion = the q_events_abtest
    // definition (≥13 purchases). All counts exact; every float is a
    // single mul/div/sqrt chain over exact-count divisions (no a+b·c
    // shapes), with the two z-quantiles as identical double literals on
    // both engines.
    //
    // Scale shape: one fact groupBy(user_id) then a 2-row rollup; the
    // design arithmetic runs on the 1-row joined frame.
    QueryDef("q_stats_power",
      (s, d) => {
        val conv = Tables.events(s, d)
          .select(col("user_id"), (col("user_id") % 2).as("variant"),
            (col("event_type") === lit("purchase")).cast("int").as("p"))
          .groupBy("user_id", "variant")
          .agg((sum(col("p")) >= 13).cast("long").as("converted"))
        val g = conv.groupBy("variant")
          .agg(count(lit(1)).as("n"), sum("converted").as("c"))
        val a = g.filter(col("variant") === 0)
          .select(col("n").as("n0"), col("c").as("c0"))
        val b = g.filter(col("variant") === 1)
          .select(col("n").as("n1"), col("c").as("c1"))
        a.crossJoin(b)
          .withColumn("p0", col("c0").cast("double") / col("n0").cast("double"))
          .withColumn("p1", col("c1").cast("double") / col("n1").cast("double"))
          .withColumn("phat", (col("c0") + col("c1")).cast("double") /
            (col("n0") + col("n1")).cast("double"))
          .withColumn("se", sqrt(col("phat") * (lit(1.0) - col("phat")) *
            (lit(1.0) / col("n0").cast("double") +
              lit(1.0) / col("n1").cast("double"))))
          // phat of exactly 0 or 1 makes se = 0 and 0/0 = NaN on Spark
          // vs a DuckDB division error — NULL on both instead (ADVICE r14)
          .withColumn("z_obs",
            (col("p1") - col("p0")) / nullif(col("se"), lit(0.0)))
          .withColumn("mde", lit(2.8015852181129683) * col("se"))
          .select(col("n0"), col("c0"), col("n1"), col("c1"),
            col("p0"), col("p1"), col("z_obs"), col("mde"),
            (abs(col("p1") - col("p0")) >= col("mde")).as("powered"))
      },
      """WITH conv AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |         >= 13 THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY user_id, user_id % 2),
        |g AS (SELECT variant, count(*)::BIGINT AS n, sum(converted)::BIGINT AS c
        |      FROM conv GROUP BY variant),
        |j AS (
        |  SELECT a.n AS n0, a.c AS c0, b.n AS n1, b.c AS c1
        |  FROM (SELECT n, c FROM g WHERE variant = 0) a,
        |       (SELECT n, c FROM g WHERE variant = 1) b),
        |x AS (
        |  SELECT n0, c0, n1, c1,
        |    c0::DOUBLE / n0::DOUBLE AS p0, c1::DOUBLE / n1::DOUBLE AS p1,
        |    sqrt(((c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE)
        |      * (1.0 - (c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE)
        |      * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)) AS se
        |  FROM j)
        |SELECT n0, c0, n1, c1, p0, p1,
        |  (p1 - p0) / nullif(se, 0.0) AS z_obs,
        |  2.8015852181129683 * se AS mde,
        |  abs(p1 - p0) >= 2.8015852181129683 * se AS powered
        |FROM x""".stripMargin))
}
