package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 11: Theil-Sen robust trend estimation over the
  * monthly order-volume series, and word burstiness (Fano factor) — a
  * robust statistic and a lexical-dispersion diagnostic.
  */
object Round11Ops11 {

  val defs: Seq[QueryDef] = Seq(

    // Theil-Sen estimator: the MEDIAN of all pairwise slopes
    // (cnt_j − cnt_i)/(m_j − m_i), i < j, over the MONTHLY order-volume
    // series — the robust trend a 30%-outlier month cannot move (vs
    // q_events_trend's least squares). Monthly, not daily, granularity
    // keeps the pair set truly bounded: the first cut of this query
    // collected 2405 daily points and sorted their 2.9M pairwise
    // slopes inside ONE row — a single-core array sort, the exact
    // in-row cliff the house rules ban (profiled 5 s flat; months:
    // ≤ 80 points → ≤ 3.2k pairs, in-row by design). Each slope is
    // ONE IEEE division of exact BIGINTs (bit-identical both
    // engines), the median an element-at after array_sort — no float
    // summation anywhere. For multi-century spans, shard the pair
    // generation by month-bucket and merge per-shard sorted runs.
    // Output: the median slope, the pair count, and the integer
    // Kendall-style direction counts (rises vs falls) as a
    // cross-check that needs no floats at all.
    QueryDef("q_stats_theilsen",
      (s, d) => {
        val months = Tables.orders(s, d)
          .select(expr("(year(o_orderdate) * 12 + month(o_orderdate) - 1)")
            .cast("long").as("m"))
          .groupBy("m").agg(count(lit(1)).as("cnt"))
        months.groupBy(lit(1).as("g"))
          .agg(array_sort(collect_list(struct(col("m"), col("cnt"))))
            .as("ds"))
          .withColumn("slopes", expr("""
            array_sort(flatten(transform(ds, (x, i) ->
              transform(slice(ds, i + 2, size(ds)), y ->
                CAST(y.cnt - x.cnt AS DOUBLE) / CAST(y.m - x.m AS DOUBLE)))))"""))
          .select(
            size(col("slopes")).cast("long").as("n_pairs"),
            expr("element_at(slopes, CAST((size(slopes) + 1) / 2 AS INT))")
              .as("median_slope"),
            expr("size(filter(slopes, v -> v > 0D))").cast("long").as("n_rising"),
            expr("size(filter(slopes, v -> v < 0D))").cast("long").as("n_falling"))
      },
      """WITH months AS (
        |  SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT
        |    AS m, count(*)::BIGINT AS cnt
        |  FROM orders GROUP BY 1),
        |packed AS (
        |  SELECT list_sort(list(struct_pack(m := m, cnt := cnt))) AS ds
        |  FROM months),
        |sl AS (
        |  SELECT list_sort(flatten(list_transform(ds, (x, i) ->
        |    list_transform(list_slice(ds, i + 1, len(ds)), y ->
        |      CAST(struct_extract(y, 'cnt') - struct_extract(x, 'cnt') AS DOUBLE)
        |      / CAST(struct_extract(y, 'm') - struct_extract(x, 'm') AS DOUBLE)))))
        |    AS slopes
        |  FROM packed)
        |SELECT len(slopes)::BIGINT AS n_pairs,
        |  slopes[CAST((len(slopes) + 1) / 2 AS INT)] AS median_slope,
        |  len(list_filter(slopes, v -> v > 0))::BIGINT AS n_rising,
        |  len(list_filter(slopes, v -> v < 0))::BIGINT AS n_falling
        |FROM sl""".stripMargin),

    // Word burstiness: the Fano factor (variance-to-mean ratio) of
    // per-document counts for the 10 globally most frequent words —
    // the lexical-dispersion readout that separates topical words
    // (bursty: VMR ≫ 1, they cluster in few docs) from function words
    // (VMR ≈ 1, Poisson-spread everywhere). Exactly integer until the
    // final division: over the N docs and a word with per-doc counts x,
    //   VMR = (N·Σx² − (Σx)²) / (N·Σx)
    // — every term a BIGINT from one (doc, word) combine (absent docs
    // contribute 0 to all sums automatically), ONE IEEE division at
    // the end.
    QueryDef("q_text_burstiness",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val tf = docs.select(col("doc_id"),
            explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("doc_id", "word").agg(count(lit(1)).as("x"))
        val top = tf.groupBy("word")
          .agg(sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
            count(lit(1)).as("n_docs_with"))
          .orderBy(col("sx").desc, col("word").asc).limit(10)
        top.crossJoin(broadcast(nDocs))
          .select(col("word"), col("sx").cast("long").as("total_count"),
            col("n_docs_with").cast("long").as("n_docs_with"),
            expr("""CAST(n_docs * sxx - sx * sx AS DOUBLE)
              / CAST(n_docs * sx AS DOUBLE)""").as("vmr"))
          .orderBy(col("total_count").desc, col("word").asc)
      },
      """WITH nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |tf AS (
        |  SELECT doc_id, word, count(*)::BIGINT AS x FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents) t0
        |  WHERE word <> '' GROUP BY 1, 2),
        |top AS (
        |  SELECT word, sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx,
        |    count(*)::BIGINT AS n_docs_with
        |  FROM tf GROUP BY 1
        |  ORDER BY sx DESC, word ASC LIMIT 10)
        |SELECT word, sx AS total_count, n_docs_with,
        |  CAST(n_docs * sxx - sx * sx AS DOUBLE)
        |    / CAST(n_docs * sx AS DOUBLE) AS vmr
        |FROM top, nd
        |ORDER BY total_count DESC, word ASC""".stripMargin),
  )
}
