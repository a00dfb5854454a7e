package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 14: mutual information between corpus source and a
  * document-length band (the information-theoretic association readout
  * — "how much does knowing the source tell you about the shape of its
  * documents?"), and per-document lexical diversity (TTR / Guiraud) —
  * the classic repetitiveness signals a quality filter thresholds.
  *
  * Scale shapes: MI reduces the corpus to a |sources|×|bands|
  * contingency with ONE combinable groupBy — every ln runs through
  * LnIeee on exact-BIGINT ratios and every float sum is a sorted fold
  * over the bounded cell frame (the q_events_entropy_rate bridge).
  * TTR is purely in-row (map-only, no shuffle at any scale).
  */
object Round11Ops14 {

  val defs: Seq[QueryDef] = Seq(

    // I(source; length band) = Σ_xy (n_xy/N)·ln(N·n_xy/(n_x·n_y)),
    // band = min(9, n_chars div 100). Per-source partial MI rows (terms
    // folded sorted by band) plus a `__total__` row folding the
    // per-source partials sorted by source — MI ≥ 0 up to float fold
    // error, = 0 iff source ⫫ band.
    QueryDef("q_stats_mi",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        def ln(c: org.apache.spark.sql.Column) = call_function("ln_ieee", c)
        val cells = Tables.documents(s, d)
          .select(col("source"),
            least(lit(9L), floor(col("n_chars") / lit(100)).cast("long")).as("band"))
          .groupBy("source", "band").agg(count(lit(1)).as("nxy"))
        val nx = cells.groupBy("source").agg(sum("nxy").as("nx"))
        val ny = cells.groupBy("band").agg(sum("nxy").as("ny"))
        val tot = cells.agg(sum("nxy").as("n"))
        val terms = cells.join(broadcast(nx), "source")
          .join(broadcast(ny), "band")
          .crossJoin(broadcast(tot))
          .select(col("source"), col("band"), col("nxy"), col("n"),
            ((col("nxy").cast("double") / col("n").cast("double"))
              * ln((col("n") * col("nxy")).cast("double")
                / (col("nx") * col("ny")).cast("double"))).as("term"))
        val perSource = terms.groupBy("source")
          .agg(sum("nxy").cast("long").as("n_rows"),
            array_sort(collect_list(struct(col("band"), col("term")))).as("ts"))
          .select(col("source"), col("n_rows"),
            aggregate(transform(col("ts"), e => e.getField("term")),
              lit(0.0), (acc, x) => acc + x).as("mi_part"))
        val total = perSource
          .groupBy(lit(1))
          .agg(sum("n_rows").cast("long").as("n_rows"),
            array_sort(collect_list(struct(col("source"), col("mi_part")))).as("ps"))
          .select(lit("__total__").as("source"), col("n_rows"),
            aggregate(transform(col("ps"), e => e.getField("mi_part")),
              lit(0.0), (acc, x) => acc + x).as("mi_part"))
        perSource.unionAll(total).orderBy("source")
      },
      """WITH cells AS (
        |  SELECT source, least(9, n_chars // 100)::BIGINT AS band,
        |    count(*)::BIGINT AS nxy
        |  FROM documents GROUP BY 1, 2),
        |nx AS (SELECT source, sum(nxy)::BIGINT AS nx FROM cells GROUP BY 1),
        |ny AS (SELECT band, sum(nxy)::BIGINT AS ny FROM cells GROUP BY 1),
        |tot AS (SELECT sum(nxy)::BIGINT AS n FROM cells),
        |terms AS (
        |  SELECT cells.source, cells.band, nxy, n,
        |    (nxy::DOUBLE / n::DOUBLE)
        |      * ln((n * nxy)::DOUBLE / (nx * ny)::DOUBLE) AS term
        |  FROM cells JOIN nx USING (source) JOIN ny USING (band), tot),
        |per_source AS (
        |  SELECT source, sum(nxy)::BIGINT AS n_rows,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(band := band, term := term))),
        |      e -> struct_extract(e, 'term'))), (x, y) -> x + y) AS mi_part
        |  FROM terms GROUP BY 1),
        |total AS (
        |  SELECT '__total__' AS source, sum(n_rows)::BIGINT AS n_rows,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(source := source, mi := mi_part))),
        |      e -> struct_extract(e, 'mi'))), (x, y) -> x + y) AS mi_part
        |  FROM per_source)
        |SELECT source, n_rows, mi_part FROM per_source
        |UNION ALL SELECT source, n_rows, mi_part FROM total
        |ORDER BY source""".stripMargin),

    // Lexical diversity per document: type-token ratio and Guiraud's
    // root-TTR (types/√tokens — the length-robust variant). Tokens are
    // the non-empty lowercased whitespace splits; types their distinct
    // count — both computed IN-ROW (size/array_distinct), so the query
    // is map-only end to end: no shuffle exists at any scale.
    QueryDef("q_text_ttr",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
        .select(col("doc_id"), col("source"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_types"))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("n_types"),
          (col("n_types").cast("double") / col("n_tokens").cast("double"))
            .as("ttr"),
          expr("CAST(n_types AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE))")
            .as("guiraud"))
        .orderBy("doc_id"),
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        |  FROM documents),
        |counted AS (
        |  SELECT doc_id, source, len(t)::BIGINT AS n_tokens,
        |    len(list_distinct(t))::BIGINT AS n_types
        |  FROM toks)
        |SELECT doc_id, source, n_tokens, n_types,
        |  n_types::DOUBLE / n_tokens::DOUBLE AS ttr,
        |  n_types::DOUBLE / sqrt(n_tokens::DOUBLE) AS guiraud
        |FROM counted WHERE n_tokens > 0
        |ORDER BY doc_id""".stripMargin),
  )
}
