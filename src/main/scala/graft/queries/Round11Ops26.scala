package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 26: a composed curation-funnel readout (per-stage
  * survivor counts through language gate → quality gate → exact dedup
  * → per-source cap — the observability row every curation run logs)
  * and seasonal-strength decomposition (how much of the daily series'
  * variance the weekly pattern explains — the statistic that justifies
  * q_events_forecast_snaive's seasonal baseline).
  *
  * Scale shapes: every funnel stage is a row predicate, a digest
  * groupBy, or a partitioned rank — the composition stays one lazy
  * plan (at cluster scale each stage persists to the lake; the counts
  * are the same either way). Seasonal strength runs on the
  * |days|-bounded daily frame with ln-free integer/decimal math.
  */
object Round11Ops26 {

  val defs: Seq[QueryDef] = Seq(

    // Curation funnel: stage-by-stage survivor counts. Stages:
    //   0 raw           — the corpus
    //   1 lang_en       — language gate (lang = 'en')
    //   2 quality       — 10 ≤ words ≤ 5000 AND not code-like
    //                     (< 2 of the q_quality_code_detect rules fire)
    //   3 dedup_exact   — one survivor per md5(text) (min doc_id)
    //   4 cap_source    — ≤ 20 docs per source by md5(doc_id) order
    // One row per stage with rows_out and drop share vs raw.
    QueryDef("q_curation_funnel",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"), col("text"))
        val s1 = base.filter(col("lang") === "en")
        val words = expr("size(filter(split(text, ' '), x -> x <> ''))")
          .cast("long")
        val chars = length(col("text")).cast("long")
        val symbols = (length(col("text"))
          - length(regexp_replace(col("text"), "[{}()\\[\\];=<>+*/&|^%#@!~`\\\\-]", "")))
          .cast("long")
        val brackets = (length(col("text"))
          - length(regexp_replace(col("text"), "[{}()\\[\\]]", ""))).cast("long")
        val vowels = (length(col("text"))
          - length(regexp_replace(lower(col("text")), "[aeiou]", ""))).cast("long")
        val codeRules = (lit(4) * symbols > chars).cast("int") +
          (lit(100) * brackets >= lit(8) * chars).cast("int") +
          (lit(5) * vowels < chars).cast("int")
        val s2 = s1.filter(words.between(10L, 5000L) && codeRules < 2)
        val s3 = s2.withColumn("h", md5(col("text").cast("binary")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("h").orderBy("doc_id")))
          .filter(col("rn") === 1).drop("rn")
        val s4 = s3.withColumn("hk", md5(col("doc_id").cast("string").cast("binary")))
          .withColumn("sr", row_number().over(
            Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))))
          .filter(col("sr") <= 20)
        def cnt(df: org.apache.spark.sql.DataFrame, stage: Int, name: String) =
          df.agg(count(lit(1)).cast("long").as("rows_out"))
            .select(lit(stage.toLong).as("stage"), lit(name).as("stage_name"),
              col("rows_out"))
        val funnel = cnt(base, 0, "raw")
          .unionAll(cnt(s1, 1, "lang_en"))
          .unionAll(cnt(s2, 2, "quality"))
          .unionAll(cnt(s3.select("doc_id"), 3, "dedup_exact"))
          .unionAll(cnt(s4.select("doc_id"), 4, "cap_source"))
        val raw = funnel.filter(col("stage") === 0)
          .select(col("rows_out").as("n_raw"))
        funnel.crossJoin(broadcast(raw))
          .select(col("stage"), col("stage_name"), col("rows_out"),
            (col("rows_out").cast("double") / col("n_raw").cast("double"))
              .as("survival"))
          .orderBy("stage")
      },
      """WITH base AS (SELECT doc_id, source, lang, text FROM documents),
        |s1 AS (SELECT * FROM base WHERE lang = 'en'),
        |scored AS (
        |  SELECT *,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
        |      AS words,
        |    length(text)::BIGINT AS c,
        |    (length(text) - length(regexp_replace(text,
        |      '[{}()\[\];=<>+*/&|^%#@!~`\\-]', '', 'g')))::BIGINT AS sy,
        |    (length(text) - length(regexp_replace(text,
        |      '[{}()\[\]]', '', 'g')))::BIGINT AS br,
        |    (length(text) - length(regexp_replace(lower(text),
        |      '[aeiou]', '', 'g')))::BIGINT AS vo
        |  FROM s1),
        |s2 AS (
        |  SELECT doc_id, source, text FROM scored
        |  WHERE words BETWEEN 10 AND 5000
        |    AND ((4 * sy > c)::INTEGER + (100 * br >= 8 * c)::INTEGER
        |      + (5 * vo < c)::INTEGER) < 2),
        |s3 AS (
        |  SELECT doc_id, source FROM (
        |    SELECT doc_id, source, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM s2) WHERE rn = 1),
        |s4 AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS sr
        |    FROM s3) WHERE sr <= 20),
        |funnel AS (
        |  SELECT 0::BIGINT AS stage, 'raw' AS stage_name,
        |    count(*)::BIGINT AS rows_out FROM base
        |  UNION ALL SELECT 1, 'lang_en', count(*)::BIGINT FROM s1
        |  UNION ALL SELECT 2, 'quality', count(*)::BIGINT FROM s2
        |  UNION ALL SELECT 3, 'dedup_exact', count(*)::BIGINT FROM s3
        |  UNION ALL SELECT 4, 'cap_source', count(*)::BIGINT FROM s4),
        |raw AS (SELECT rows_out AS n_raw FROM funnel WHERE stage = 0)
        |SELECT stage, stage_name, rows_out,
        |  rows_out::DOUBLE / n_raw::DOUBLE AS survival
        |FROM funnel, raw ORDER BY stage""".stripMargin),

    // Weekly seasonal strength of the daily event-count series:
    // s = max(0, 1 − Var(x − m_dow) / Var(x)) over the |days|-bounded
    // frame, where m_dow is each day-of-week's mean (the additive
    // seasonal component). Variances via exact BIGINT/decimal moments
    // — n·Σe² vs (n·Σx² − (Σx)²) with the remainder scaled by the dow
    // counts to stay integral: e_d = cnt_d·k_w − S_w for day d in dow
    // class w of size k_w and class sum S_w, Var(e/k) compared against
    // Var(x) in DOUBLE at the end only.
    QueryDef("q_events_seasonal_strength",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .groupBy("day").agg(count(lit(1)).cast("long").as("cnt"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
        val dow = daily.groupBy("dow")
          .agg(sum("cnt").cast("long").as("sw"),
            count(lit(1)).cast("long").as("kw"))
        daily.join(broadcast(dow), "dow")
          .select(col("day"), col("cnt"),
            (col("cnt") * col("kw") - col("sw")).cast("double").as("enum"),
            col("kw").cast("double").as("kw"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cnt").cast("long").as("sx"),
            sum(col("cnt") * col("cnt")).cast("long").as("sxx"),
            array_sort(collect_list(struct(col("day"),
              ((col("enum") / col("kw")) * (col("enum") / col("kw")))
                .as("e2")))).as("es"))
          .select(col("n"), col("sx"), col("sxx"),
            aggregate(transform(col("es"), e => e.getField("e2")),
              lit(0.0), (acc, x) => acc + x).as("see"))
          .select(col("n"),
            expr("""(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))""").as("var_x"),
            (col("see") / col("n").cast("double")).as("var_e"))
          .withColumn("strength",
            greatest(lit(0.0), lit(1.0) - col("var_e") / col("var_x")))
          .select("n", "var_x", "var_e", "strength")
      },
      """WITH daily AS (
        |  SELECT floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1),
        |dowd AS (SELECT day, cnt, day % 7 AS dow FROM daily),
        |dow AS (SELECT dow, sum(cnt)::BIGINT AS sw, count(*)::BIGINT AS kw
        |        FROM dowd GROUP BY 1),
        |terms AS (
        |  SELECT day, cnt,
        |    ((cnt * kw - sw)::DOUBLE / kw::DOUBLE)
        |      * ((cnt * kw - sw)::DOUBLE / kw::DOUBLE) AS e2
        |  FROM dowd JOIN dow USING (dow)),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n, sum(cnt)::BIGINT AS sx,
        |    sum(cnt * cnt)::BIGINT AS sxx,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(day := day, e2 := e2))),
        |      e -> struct_extract(e, 'e2'))), (x, y) -> x + y) AS see
        |  FROM terms)
        |SELECT n,
        |  (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |    / (n::DOUBLE * n::DOUBLE) AS var_x,
        |  see / n::DOUBLE AS var_e,
        |  greatest(0.0, 1.0 - (see / n::DOUBLE)
        |    / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      / (n::DOUBLE * n::DOUBLE))) AS strength
        |FROM agg""".stripMargin),
  )
}
