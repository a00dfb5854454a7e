package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 3: Welch's unequal-variance t-test (the two-sample
  * mean comparison q_events_abtest's proportion z-test doesn't cover)
  * and per-language tokenizer fertility (tokens/word, chars/token —
  * the statistic that decides multilingual mixing budgets, since a
  * high-fertility language burns more context per word).
  *
  * House rules: exact integer/decimal co-moments into ONE shared IEEE
  * formula; ASCII-only token regex (both regex engines agree per code
  * point); nullif-guarded divisions; BIGINT casts on the oracle's
  * outer sums.
  */
object Round10Ops3 {

  val defs: Seq[QueryDef] = Seq(

    // Welch's t-test: is the mean order value of BUILDING customers
    // different from MACHINERY's? Exact integer cents through the
    // n/Σ/Σ² co-moment discipline (Σ² as DECIMAL(38,0) — the products
    // fit i64, only the sum would overflow), then t and the
    // Welch–Satterthwaite df in one shared IEEE expression tree.
    // Scale: one broadcast dim join + one map-side-combined 2-group
    // aggregate; everything after is 2 rows.
    QueryDef("q_stats_ttest",
      (s, d) => {
        val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
        val g = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_mktsegment").as("seg"), cents.as("v"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), sum("v").as("sv"),
            sum((col("v") * col("v")).cast("decimal(38,0)")).as("ss"))
        val mean = col("sv").cast("double") / col("n").cast("double") / 100.0
        val varc = (col("ss").cast("double") -
          col("sv").cast("double") * col("sv").cast("double") /
            col("n").cast("double")) /
          (col("n") - 1L).cast("double") / 10000.0
        val a = g.filter(col("seg") === "BUILDING")
          .select(col("n").as("n1"), mean.as("m1"), varc.as("v1"))
        val b = g.filter(col("seg") === "MACHINERY")
          .select(col("n").as("n2"), mean.as("m2"), varc.as("v2"))
        a.crossJoin(broadcast(b))
          .withColumn("se1", col("v1") / col("n1").cast("double"))
          .withColumn("se2", col("v2") / col("n2").cast("double"))
          .select(col("n1"), col("n2"), col("m1"), col("m2"),
            ((col("m1") - col("m2")) /
              nullif(sqrt(col("se1") + col("se2")), lit(0.0))).as("t_stat"),
            (((col("se1") + col("se2")) * (col("se1") + col("se2"))) /
              nullif(col("se1") * col("se1") / (col("n1") - 1L).cast("double") +
                col("se2") * col("se2") / (col("n2") - 1L).cast("double"),
                lit(0.0))).as("df_welch"))
      },
      """WITH g AS (
        |  SELECT c_mktsegment AS seg, count(*) AS n,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS sv,
        |    sum((floor(o_totalprice * 100 + 0.5)::BIGINT
        |         * floor(o_totalprice * 100 + 0.5)::BIGINT)::DECIMAL(38,0)) AS ss
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  GROUP BY 1),
        |m AS (
        |  SELECT seg, n,
        |    sv::DOUBLE / n::DOUBLE / 100.0 AS mean,
        |    (ss::DOUBLE - sv::DOUBLE * sv::DOUBLE / n::DOUBLE)
        |      / (n - 1)::DOUBLE / 10000.0 AS varc
        |  FROM g),
        |a AS (SELECT n AS n1, mean AS m1, varc AS v1 FROM m WHERE seg = 'BUILDING'),
        |b AS (SELECT n AS n2, mean AS m2, varc AS v2 FROM m WHERE seg = 'MACHINERY'),
        |j AS (
        |  SELECT n1, n2, m1, m2,
        |    v1 / n1::DOUBLE AS se1, v2 / n2::DOUBLE AS se2
        |  FROM a, b)
        |SELECT n1, n2, m1, m2,
        |  (m1 - m2) / nullif(sqrt(se1 + se2), 0.0) AS t_stat,
        |  ((se1 + se2) * (se1 + se2))
        |    / nullif(se1 * se1 / (n1 - 1)::DOUBLE
        |             + se2 * se2 / (n2 - 1)::DOUBLE, 0.0) AS df_welch
        |FROM j""".stripMargin),

    // Tokenizer fertility by language: whitespace words vs BPE-ish
    // regex subtokens (letter runs | digit runs | single
    // non-alphanumeric — the GPT-2-style pre-tokenizer reduced to its
    // ASCII core so both regex engines agree per code point).
    // tokens/word > 1 means the tokenizer fragments that language's
    // words — the statistic that sets per-language sampling budgets
    // (a high-fertility language burns more context per word). Scale:
    // one map-side-combined aggregate; output is |languages| rows.
    QueryDef("q_text_fertility",
      (s, d) => {
        val toks = size(expr(
          """regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"""))
          .cast("long")
        val words = size(split(col("text"), " ")).cast("long")
        Tables.documents(s, d)
          .select(col("lang"), words.as("w"), toks.as("t"),
            length(col("text")).cast("long").as("c"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
            sum("t").as("n_subtokens"), sum("c").as("n_chars"))
          .select(col("lang"), col("n_docs"), col("n_words"),
            col("n_subtokens"), col("n_chars"),
            (col("n_subtokens").cast("double") /
              nullif(col("n_words").cast("double"), lit(0.0)))
              .as("tokens_per_word"),
            (col("n_chars").cast("double") /
              nullif(col("n_subtokens").cast("double"), lit(0.0)))
              .as("chars_per_token"))
          .orderBy("lang")
      },
      """WITH t AS (
        |  SELECT lang,
        |    len(string_split(text, ' '))::BIGINT AS w,
        |    len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS t,
        |    length(text)::BIGINT AS c
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, sum(w)::BIGINT AS n_words,
        |  sum(t)::BIGINT AS n_subtokens, sum(c)::BIGINT AS n_chars,
        |  sum(t)::DOUBLE / nullif(sum(w)::DOUBLE, 0.0) AS tokens_per_word,
        |  sum(c)::DOUBLE / nullif(sum(t)::DOUBLE, 0.0) AS chars_per_token
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin))
}
