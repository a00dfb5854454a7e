package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 5: two classical nonparametric/association statistics
  * (Mann-Whitney U, Cramér's V) and a readability profile — the
  * data-quality statistics a curation pipeline runs per snapshot.
  *
  * Scale shapes: every query reduces the fact table with ONE combinable
  * groupBy into a bounded cell/histogram frame (≤ 50 quantity values,
  * ≤ |types|×|cohorts| cells, ≤ |sources|×|bands| rows); all windows and
  * folds sit strictly ABOVE that aggregate (house rule — no
  * unpartitioned window ever sees a fact-sized input).
  */
object Round11Ops5 {

  val defs: Seq[QueryDef] = Seq(

    // Mann-Whitney U (Wilcoxon rank-sum) comparing the l_quantity
    // distribution of returned (R) vs accepted (A) lines — the standard
    // "did this cohort shift?" test when normality is off the table.
    // l_quantity is integral with ≤ 50 distinct values, so the test
    // runs EXACTLY on the value histogram: U = Σ_v nR(v)·(#B below v +
    // nA(v)/2), doubled (u2 = 2U) to stay in BIGINT. Ties enter the
    // z-score through Σ(t³−t). The fact scan is one combinable
    // conditional-count groupBy; ranks never materialize per row.
    QueryDef("q_stats_mannwhitney",
      (s, d) => {
        val hist = Tables.lineitem(s, d)
          .filter(col("l_returnflag").isin("R", "A"))
          .select(col("l_quantity").cast("long").as("v"),
            (col("l_returnflag") === "R").as("is_r"))
          .groupBy("v")
          .agg(count(when(col("is_r"), lit(1))).as("nr"),
            count(when(!col("is_r"), lit(1))).as("na"))
        val w = Window.orderBy("v")
        val cum = hist.withColumn("below_a",
          coalesce(sum("na").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        cum.agg(
            sum("nr").cast("long").as("n_r"),
            sum("na").cast("long").as("n_a"),
            sum(col("nr") * (lit(2) * col("below_a") + col("na")))
              .cast("long").as("u2"),
            sum((col("nr") + col("na")) * (col("nr") + col("na"))
              * (col("nr") + col("na")) - (col("nr") + col("na")))
              .cast("long").as("tie_sum"))
          .withColumn("z",
            expr("""(CAST(u2 AS DOUBLE) - CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE))
              / sqrt(4.0 * (CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE) / 12.0
                * (CAST(n_r + n_a + 1 AS DOUBLE)
                   - CAST(tie_sum AS DOUBLE)
                     / (CAST(n_r + n_a AS DOUBLE) * CAST(n_r + n_a - 1 AS DOUBLE)))))"""))
          .select("n_r", "n_a", "u2", "tie_sum", "z")
      },
      """WITH hist AS (
        |  SELECT l_quantity::BIGINT AS v,
        |    count(CASE WHEN l_returnflag = 'R' THEN 1 END)::BIGINT AS nr,
        |    count(CASE WHEN l_returnflag = 'A' THEN 1 END)::BIGINT AS na
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1),
        |cum AS (
        |  SELECT *, coalesce(sum(na) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |    AS below_a
        |  FROM hist),
        |agg AS (
        |  SELECT sum(nr)::BIGINT AS n_r, sum(na)::BIGINT AS n_a,
        |    sum(nr * (2 * below_a + na))::BIGINT AS u2,
        |    sum((nr + na) * (nr + na) * (nr + na) - (nr + na))::BIGINT
        |      AS tie_sum
        |  FROM cum)
        |SELECT n_r, n_a, u2, tie_sum,
        |  (CAST(u2 AS DOUBLE) - CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE))
        |    / sqrt(4.0 * (CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE) / 12.0
        |      * (CAST(n_r + n_a + 1 AS DOUBLE)
        |         - CAST(tie_sum AS DOUBLE)
        |           / (CAST(n_r + n_a AS DOUBLE) * CAST(n_r + n_a - 1 AS DOUBLE)))))
        |    AS z
        |FROM agg""".stripMargin),

    // Cramér's V: strength of association between event_type and a
    // user cohort (user_id mod 5) — chi-square normalized to [0, 1] by
    // n·(min(r,c)−1), the readout that stays comparable across tables
    // of different size. Same shape as q_stats_chisq (one combinable
    // cell count; windows over the ≤ r·c cell frame; float terms
    // summed in a SORTED fold so both engines add in one order), plus
    // the min-dimension normalization and sqrt.
    QueryDef("q_stats_cramersv",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type"), (col("user_id") % 5).cast("long").as("cohort"))
          .groupBy("event_type", "cohort").agg(count(lit(1)).as("o"))
        val wt = Window.partitionBy("event_type")
        val wb = Window.partitionBy("cohort")
        val wall = Window.partitionBy()
        cells
          .withColumn("rt", sum("o").over(wt))
          .withColumn("ct", sum("o").over(wb))
          .withColumn("n", sum("o").over(wall))
          .withColumn("e",
            col("rt").cast("double") * col("ct").cast("double") /
              col("n").cast("double"))
          .withColumn("term",
            (col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e"))
          .groupBy(lit(1).as("g"))
          .agg(max("n").as("n"),
            countDistinct("event_type").cast("long").as("r"),
            countDistinct("cohort").cast("long").as("c"),
            array_sort(collect_list(
              struct(col("event_type"), col("cohort"), col("term")))).as("terms"))
          .withColumn("chi2",
            aggregate(col("terms"), lit(0.0),
              (acc, e) => acc + e.getField("term")))
          .select(col("n"), col("r"), col("c"), col("chi2"),
            expr("""sqrt(chi2 / (CAST(n AS DOUBLE)
              * CAST(least(r, c) - 1 AS DOUBLE)))""").as("v"))
      },
      """WITH cells AS (
        |  SELECT event_type, (user_id % 5)::BIGINT AS cohort, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, cohort, o,
        |    sum(o) OVER (PARTITION BY event_type) AS rt,
        |    sum(o) OVER (PARTITION BY cohort) AS ct,
        |    sum(o) OVER () AS n
        |  FROM cells),
        |terms AS (
        |  SELECT event_type, cohort, n,
        |    (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
        |      * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
        |      / (rt::DOUBLE * ct::DOUBLE / n::DOUBLE) AS term
        |  FROM t),
        |agg AS (
        |  SELECT max(n)::BIGINT AS n,
        |    count(DISTINCT event_type)::BIGINT AS r,
        |    count(DISTINCT cohort)::BIGINT AS c,
        |    list_reduce(list_prepend(0.0, list_transform(
        |        list_sort(list(struct_pack(
        |          event_type := event_type, cohort := cohort, term := term))),
        |        e -> struct_extract(e, 'term'))),
        |      (a, b) -> a + b) AS chi2
        |  FROM terms)
        |SELECT n, r, c, chi2,
        |  sqrt(chi2 / (CAST(n AS DOUBLE)
        |    * CAST(least(r, c) - 1 AS DOUBLE))) AS v
        |FROM agg""".stripMargin),

    // Flesch reading-ease profile: per-doc score from three integer
    // counts (words, sentence enders, vowel-group syllable proxy —
    // the standard heuristic when no dictionary is at hand), bucketed
    // into 10-point bands and histogrammed per source. The per-doc
    // score is a single scalar float expression over integers
    // (bit-identical on both engines); only INTEGER band counts cross
    // the aggregation, so no float-sum order can diverge. One
    // projection + one combinable groupBy — embarrassingly parallel.
    QueryDef("q_text_readability",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"),
            expr("size(filter(split(text, ' '), x -> x <> ''))")
              .cast("long").as("w"),
            expr("greatest(1, regexp_count(text, '[.!?]+'))")
              .cast("long").as("sents"),
            expr("greatest(1, regexp_count(lower(text), '[aeiouy]+'))")
              .cast("long").as("syl"))
          .filter(col("w") > 0)
          .withColumn("flesch",
            expr("""206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))
              - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))"""))
          .withColumn("band",
            floor(col("flesch") / lit(10.0)).cast("long"))
          .groupBy("source", "band")
          .agg(count(lit(1)).as("n_docs"),
            sum("w").cast("long").as("n_words"))
          .orderBy("source", "band")
      },
      """WITH scored AS (
        |  SELECT source,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS w,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT AS sents,
        |    greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))::BIGINT
        |      AS syl
        |  FROM documents),
        |banded AS (
        |  SELECT source,
        |    floor((206.835 - 1.015 * (w::DOUBLE / sents::DOUBLE)
        |      - 84.6 * (syl::DOUBLE / w::DOUBLE)) / 10.0)::BIGINT AS band,
        |    w
        |  FROM scored WHERE w > 0)
        |SELECT source, band, count(*)::BIGINT AS n_docs,
        |  sum(w)::BIGINT AS n_words
        |FROM banded GROUP BY 1, 2
        |ORDER BY source, band""".stripMargin),
  )
}
