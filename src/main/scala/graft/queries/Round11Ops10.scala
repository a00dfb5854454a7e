package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextAnalysis

/** Round-11 batch 10: a Gopher-style quality-rule battery with
  * per-rule attribution, and burst detection over an event-count day
  * series via a hysteresis automaton.
  */
object Round11Ops10 {

  val defs: Seq[QueryDef] = Seq(

    // Gopher-style repetition/format rule battery (Rae et al. 2021
    // §A1.1 adapted to the synthetic corpus): five independent
    // per-doc rules, reported with PER-RULE fail counts per source —
    // the attribution a curation team needs ("which rule kills how
    // many docs WHERE") that a single pass/fail score (q_text_quality)
    // cannot give. Every rule is an INTEGER cross-multiplication
    // (3·nw ≤ wchars, 5·nalpha ≥ 4·nw, …) — no ratio ever touches a
    // float. One projection + one combinable groupBy.
    QueryDef("q_quality_gopher",
      (s, d) => {
        val t = col("text")
        val nw = size(filter(TextAnalysis.tokens(t), w => w =!= ""))
          .cast("long")
        val wchars = length(replace(t, lit(" "), lit(""))).cast("long")
        val nHash = (length(t) - length(replace(t, lit("#"), lit(""))))
          .cast("long")
        val nEll = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3)
          .cast("long")
        val nAlpha = size(filter(TextAnalysis.tokens(t),
          w => w.rlike("[a-zA-Z]"))).cast("long")
        val nStop = TextAnalysis.hitCount(t, TextAnalysis.enStopwords)
        val rules = Seq(
          "fail_wordcount" -> !(nw >= 20L && nw <= 1000L),
          "fail_wordlen" -> !(lit(3L) * nw <= wchars && wchars <= lit(10L) * nw),
          "fail_symbol" -> !(lit(10L) * (nHash + nEll) <= nw),
          "fail_alpha" -> !(lit(5L) * nAlpha >= lit(4L) * nw),
          "fail_stopword" -> !(nStop >= 2L))
        Tables.documents(s, d)
          .select(col("source") +: rules.map { case (n, c) => c.as(n) }: _*)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            rules.map { case (n, _) =>
              count(when(col(n), lit(1))).as(n) } :+
              count(when(rules.map(r => !col(r._1)).reduce(_ && _), lit(1)))
                .as("n_pass"): _*)
          .orderBy("source")
      },
      s"""WITH per_doc AS (
        |  SELECT source,
        |    len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS nw,
        |    length(replace(text, ' ', ''))::BIGINT AS wchars,
        |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
        |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ell,
        |    len(list_filter(string_split(text, ' '),
        |      w -> regexp_matches(w, '[a-zA-Z]')))::BIGINT AS n_alpha,
        |    ${TextAnalysis.hitCountSql("text", TextAnalysis.enStopwords)} AS n_stop
        |  FROM documents),
        |flags AS (
        |  SELECT source,
        |    NOT (nw >= 20 AND nw <= 1000) AS fail_wordcount,
        |    NOT (3 * nw <= wchars AND wchars <= 10 * nw) AS fail_wordlen,
        |    NOT (10 * (n_hash + n_ell) <= nw) AS fail_symbol,
        |    NOT (5 * n_alpha >= 4 * nw) AS fail_alpha,
        |    NOT (n_stop >= 2) AS fail_stopword
        |  FROM per_doc)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  count(CASE WHEN fail_wordcount THEN 1 END)::BIGINT AS fail_wordcount,
        |  count(CASE WHEN fail_wordlen THEN 1 END)::BIGINT AS fail_wordlen,
        |  count(CASE WHEN fail_symbol THEN 1 END)::BIGINT AS fail_symbol,
        |  count(CASE WHEN fail_alpha THEN 1 END)::BIGINT AS fail_alpha,
        |  count(CASE WHEN fail_stopword THEN 1 END)::BIGINT AS fail_stopword,
        |  count(CASE WHEN NOT fail_wordcount AND NOT fail_wordlen
        |    AND NOT fail_symbol AND NOT fail_alpha AND NOT fail_stopword
        |    THEN 1 END)::BIGINT AS n_pass
        |FROM flags GROUP BY source
        |ORDER BY source""".stripMargin),

    // Burst detection over the per-day 'error' count series: a day is
    // HIGH when 2·count > 3·base (base = mean daily count, floor — an
    // integer cross-multiplication), and a 4-state hysteresis automaton
    // (enter a burst after 2 consecutive HIGH days, leave after 2
    // consecutive low) turns the noisy HIGH flags into stable burst
    // intervals — the alert-quality trick every monitoring pipeline
    // uses to stop flapping. Gap days count 0 (silence is a LOW
    // signal), generated from the bounded min..max day span.
    //
    // Scale shape: one combinable (day) count of the filtered fact
    // scan; the day frame is bounded (|window days|); the automaton is
    // an indexed prefix fold over the COLLECTED day array with the
    // IDENTICAL CASE transition text on both engines (the q_events_cep
    // bridge), packed state s = 2·in_burst + run ∈ {0..3}.
    QueryDef("q_events_bursts",
      (s, d) => {
        val errs = Tables.events(s, d).filter(col("event_type") === "error")
          .select(expr(
            "unix_millis(date_trunc('MILLISECOND', ts)) div 86400000")
            .as("day"))
        val counts = errs.groupBy("day").agg(count(lit(1)).as("cnt"))
        val span = counts.agg(min("day").as("d0"), max("day").as("d1"),
          sum("cnt").as("total"))
          .withColumn("base", expr("total div (d1 - d0 + 1)"))
        val days = span
          .select(col("base"), explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(counts, Seq("day"), "left")
          .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"),
            (lit(2L) * coalesce(col("cnt"), lit(0L)) > lit(3L) * col("base"))
              .as("high"))
        days.groupBy(lit(1).as("g"))
          .agg(array_sort(collect_list(struct(
            col("day"), col("cnt"), col("high")))).as("ds"))
          .withColumn("out", expr("""
            transform(ds, (x, i) -> struct(
              x.day AS day, x.cnt AS cnt, x.high AS high,
              aggregate(
                transform(slice(ds, 1, i + 1), e -> CASE WHEN e.high THEN 1L ELSE 0L END),
                CAST(0 AS BIGINT),
                (s, h) -> CAST(CASE WHEN s < 2 THEN (CASE WHEN h = 1 THEN (CASE WHEN s = 1 THEN 2 ELSE 1 END) ELSE 0 END) ELSE (CASE WHEN h = 1 THEN 2 ELSE (CASE WHEN s = 3 THEN 0 ELSE 3 END) END) END AS BIGINT)
              ) >= 2 AS in_burst))"""))
          .select(explode(col("out")).as("r"))
          .select("r.day", "r.cnt", "r.high", "r.in_burst")
          .orderBy("day")
      },
      """WITH errs AS (
        |  SELECT epoch_ms(date_trunc('millisecond', ts)) // 86400000 AS day
        |  FROM events WHERE event_type = 'error'),
        |counts AS (SELECT day, count(*)::BIGINT AS cnt FROM errs GROUP BY 1),
        |span AS (SELECT min(day) AS d0, max(day) AS d1, sum(cnt) AS total,
        |           (sum(cnt) // (max(day) - min(day) + 1))::BIGINT AS base
        |         FROM counts),
        |days AS (
        |  SELECT g.day, coalesce(cnt, 0)::BIGINT AS cnt,
        |    2 * coalesce(cnt, 0) > 3 * base AS high
        |  FROM (SELECT base, unnest(range(d0, d1 + 1)) AS day FROM span) g
        |    LEFT JOIN counts ON g.day = counts.day),
        |packed AS (
        |  SELECT list_sort(list(struct_pack(day := day, cnt := cnt,
        |    high := high))) AS ds
        |  FROM days),
        |curve AS (
        |  SELECT unnest(list_transform(ds, (x, i) -> struct_pack(
        |    day := struct_extract(x, 'day'),
        |    cnt := struct_extract(x, 'cnt'),
        |    high := struct_extract(x, 'high'),
        |    in_burst := list_reduce(
        |      list_prepend(0::BIGINT,
        |        list_transform(list_slice(ds, 1, i),
        |          e -> CASE WHEN struct_extract(e, 'high') THEN 1::BIGINT ELSE 0::BIGINT END)),
        |      (s, h) -> CAST(CASE WHEN s < 2 THEN (CASE WHEN h = 1 THEN (CASE WHEN s = 1 THEN 2 ELSE 1 END) ELSE 0 END) ELSE (CASE WHEN h = 1 THEN 2 ELSE (CASE WHEN s = 3 THEN 0 ELSE 3 END) END) END AS BIGINT)
        |    ) >= 2))) AS r
        |  FROM packed)
        |SELECT struct_extract(r, 'day')::BIGINT AS day,
        |  struct_extract(r, 'cnt')::BIGINT AS cnt,
        |  struct_extract(r, 'high') AS high,
        |  struct_extract(r, 'in_burst') AS in_burst
        |FROM curve ORDER BY day""".stripMargin),
  )
}
