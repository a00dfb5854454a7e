package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Round-10 batch 2: perceptual-hash NEAR-dup pairs (completing the
  * image-dedup story q_multimodal_phash opens with exact groups),
  * temperature-scaled source mixing (the T5/XLM-R p^α rule),
  * binarized-embedding Hamming retrieval (sign-bit signatures — the
  * memory-bound ANN tier below PQ), and a seasonal-naive forecast
  * baseline with MASE-style evaluation.
  *
  * House determinism rules: integer bit-twiddling for signatures and
  * Hamming distances (bit_count over XOR on both engines — band keys
  * mask after the shift so arithmetic-vs-logical sign fill cancels),
  * sqrt (IEEE-exact on both engines) instead of pow for the α=0.5
  * temperature, order-pinned folds for cross-source sums, and
  * timestamp-join (not positional lag) for the seasonal offset so
  * series gaps can't misalign the comparison.
  */
object Round10Ops2 {

  val defs: Seq[QueryDef] = Seq(

    // Perceptual NEAR-duplicate pairs over the dHash: 4 bands × 16
    // bits. Pigeonhole: ≤ 3 bit errors are GUARANTEED to leave one of
    // the 4 bands identical (recall = 1 there); at 4–6 errors a clean
    // band is likely but not certain — the standard probabilistic
    // banding trade, the same contract as the MinHash bands. Buckets cap
    // at 16 members by smallest doc_id (the capped-LSH house pattern,
    // WindowGroupLimit) so a degenerate hash cluster can never go
    // bucket². 8-byte hashes and band keys shuffle — never pixels.
    QueryDef("q_multimodal_phash_neardup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ph = Multimodal.phash(
          Multimodal.pngPayload(Tables.documents(s, d), "doc_id"), "doc_id")
          .localCheckpoint(eager = false) // both join sides, one decode pass
        val bands = ph.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("b"))
          .select(col("doc_id"), col("phash"), col("b"),
            expr("shiftright(phash, cast(b * 16 as int)) & 65535").as("k"))
        val w = Window.partitionBy("b", "k").orderBy("doc_id")
        val capped = bands.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 16).drop("rn")
        val cand = capped.as("x").join(capped.as("y"),
            expr("x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            col("x.phash").as("p1"), col("y.phash").as("p2"))
          .distinct()
        cand
          .select(col("d1"), col("d2"),
            expr("cast(bit_count(p1 ^ p2) as bigint)").as("hamming"))
          .filter(col("hamming") <= 6)
          .orderBy("d1", "d2")
      },
      """WITH dims AS (
        |  SELECT doc_id, (doc_id % 13 + 4)::BIGINT AS w,
        |    (doc_id % 11 + 3)::BIGINT AS h
        |  FROM documents),
        |gy AS (SELECT *, unnest(range(8)) AS y FROM dims),
        |gx AS (SELECT *, unnest(range(1, 9)) AS x FROM gy),
        |bits AS (
        |  SELECT doc_id, y, x,
        |    (((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) % 256) * 299
        |      + ((((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 13) % 256) * 587
        |      + ((((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 26) % 256) * 114
        |      AS lum1,
        |    ((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) % 256) * 299
        |      + (((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 13) % 256) * 587
        |      + (((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 26) % 256) * 114
        |      AS lum0
        |  FROM gx),
        |ph AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN lum1 > lum0 THEN
        |        CASE WHEN y * 8 + (x - 1) = 63
        |             THEN (-9223372036854775807 - 1)::BIGINT
        |             ELSE 1::BIGINT << (y * 8 + (x - 1))::INT END
        |        ELSE 0 END)::BIGINT AS phash
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, phash, b, (phash >> (b * 16)::INT) & 65535 AS k
        |  FROM ph, (SELECT unnest(range(4)) AS b)),
        |capped AS (
        |  SELECT doc_id, phash, b, k FROM (
        |    SELECT *, row_number() OVER (PARTITION BY b, k ORDER BY doc_id) AS rn
        |    FROM bands) WHERE rn <= 16),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
        |    x.phash AS p1, y.phash AS p2
        |  FROM capped x JOIN capped y
        |    ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id)
        |SELECT d1, d2, bit_count(xor(p1, p2))::BIGINT AS hamming
        |FROM cand WHERE bit_count(xor(p1, p2)) <= 6
        |ORDER BY d1, d2""".stripMargin),

    // Temperature-scaled mixture weights (α = 0.5): w_i ∝ p_i^α — the
    // multilingual/multi-source rebalancing rule (T5, XLM-R) that
    // upsamples small sources without flattening to uniform. α = 0.5
    // deliberately: p^0.5 = sqrt, which is IEEE-EXACT on both engines,
    // where a general pow() is not bit-stable across libm
    // implementations. The Σ√p denominator folds over the
    // source-sorted list (the q_text_entropy technique). Scale: one
    // map-side-combined token count per source; everything after is
    // |sources|-bounded.
    QueryDef("q_mix_temperature",
      (s, d) => {
        val perSource = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        val tot = perSource.agg(sum("n_tokens").as("total_tokens"))
        val p = perSource.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (col("n_tokens").cast("double") /
              col("total_tokens").cast("double")).as("p"))
          .withColumn("sp", sqrt(col("p")))
        val denom = p
          .agg(array_sort(collect_list(struct(col("source"), col("sp"))))
            .as("arr"))
          .select(aggregate(col("arr"), lit(0.0),
            (acc, e) => acc + e.getField("sp")).as("z"))
        p.crossJoin(broadcast(denom))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("p"),
            (col("sp") / col("z")).as("temp_share"),
            ((col("sp") / col("z")) / col("p")).as("upsample_factor"))
          .orderBy("source")
      },
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT sum(n_tokens)::BIGINT AS total_tokens FROM s),
        |p AS (
        |  SELECT source, n_docs, n_tokens,
        |    n_tokens::DOUBLE / total_tokens::DOUBLE AS p,
        |    sqrt(n_tokens::DOUBLE / total_tokens::DOUBLE) AS sp
        |  FROM s, t),
        |z AS (
        |  SELECT list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(source := source, sp := sp))),
        |      e -> struct_extract(e, 'sp'))), (a, b) -> a + b) AS z
        |  FROM p)
        |SELECT source, n_docs, n_tokens, p,
        |  sp / z AS temp_share, (sp / z) / p AS upsample_factor
        |FROM p, z ORDER BY source""".stripMargin),

    // Binarized-embedding retrieval: 63 sign bits per vector (bit 63
    // left clear — 1<<63 overflows DuckDB's BIGINT shift), Hamming
    // distance by bit_count(xor) — 8 bytes/vector, the memory tier
    // BELOW PQ codes (Charikar'02 SRP: E[hamming] ∝ angle). Three
    // query vectors broadcast; per query the scan is one XOR+popcount
    // per vector (no float math at all), top-10 by (hamming, vec_id)
    // via WindowGroupLimit-prunable rank. The true cosine rides along
    // for each hit so the output exposes the approximation error
    // directly; recall vs exact cosine top-10 is pinned in
    // Round10Spec2.
    QueryDef("q_emb_hamming",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sigExpr = expr(
          """aggregate(sequence(0, 62), cast(0 as bigint), (acc, i) ->
            |  acc + CASE WHEN element_at(embedding, i + 1) > 0
            |    THEN shiftleft(cast(1 as bigint), cast(i as int))
            |    ELSE cast(0 as bigint) END)""".stripMargin)
        val sigs = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), sigExpr.as("sig"))
          .localCheckpoint(eager = false)
        val queries = sigs.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
            col("sig").as("qsig"))
        val scored = sigs.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            expr("cast(bit_count(sig ^ qsig) as bigint)").as("hamming"),
            graft.functions.Similarity.cosine(col("embedding"), col("qe"))
              .as("cos"))
        val w = Window.partitionBy("q_id").orderBy(col("hamming").asc,
          col("vec_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("hamming"), col("cos"))
          .orderBy("q_id", "rank")
      },
      s"""WITH sigs AS (
        |  SELECT vec_id, embedding,
        |    list_reduce(list_prepend(0::BIGINT, range(63)), (acc, i) ->
        |      acc + CASE WHEN embedding[i + 1] > 0
        |        THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END) AS sig
        |  FROM embeddings),
        |queries AS (
        |  SELECT vec_id AS q_id, embedding AS qe, sig AS qsig
        |  FROM sigs WHERE vec_id < 3),
        |scored AS (
        |  SELECT q_id, vec_id,
        |    bit_count(xor(sig, qsig))::BIGINT AS hamming,
        |    ${graft.functions.Similarity.cosineSql("embedding", "qe")} AS cos
        |  FROM sigs, queries WHERE vec_id <> q_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY hamming ASC, vec_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, rank::BIGINT AS rank, vec_id, hamming, cos
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin),

    // Seasonal-naive forecast baseline + MASE-style readout: per event
    // type, forecast ĉ(t) = c(t − 168 h) (same hour last week) and
    // score it against the 1-hour naive ĉ(t) = c(t − 1 h) — the two
    // baselines every real forecaster must beat (Hyndman's MASE uses
    // the seasonal-naive MAE as its scale). Offsets join by TIMESTAMP
    // (h − INTERVAL), not by row position, so series gaps can't
    // misalign a comparison; every |Δ| is an exact BIGINT and the two
    // MAEs are single divisions. Scale: one map-side-combined hourly
    // rollup (the q_events_seasonality shape), then two self-joins on
    // (type, hour) keys carrying counts only.
    QueryDef("q_events_forecast_snaive",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(eager = false)
        val wk = hourly.select(col("event_type"),
          (col("h") + expr("INTERVAL 168 HOURS")).as("h"), col("c").as("c_wk"))
        val hr = hourly.select(col("event_type"),
          (col("h") + expr("INTERVAL 1 HOUR")).as("h"), col("c").as("c_hr"))
        hourly
          .join(wk, Seq("event_type", "h"))
          .join(hr, Seq("event_type", "h"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("c") - col("c_wk"))).cast("long").as("ae_snaive"),
            sum(abs(col("c") - col("c_hr"))).cast("long").as("ae_naive1"))
          .select(col("event_type"), col("n_eval"),
            (col("ae_snaive").cast("double") / col("n_eval").cast("double"))
              .as("mae_snaive"),
            (col("ae_naive1").cast("double") / col("n_eval").cast("double"))
              .as("mae_naive1"),
            // nullif: a zero naive-1 error (possible on a tiny/degenerate
            // series) must yield NULL on BOTH engines, not throw/inf
            (col("ae_snaive").cast("double") /
              nullif(col("ae_naive1").cast("double"), lit(0.0)))
              .as("rel_mase"))
          .orderBy("event_type")
      },
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.c, w.c AS c_wk, p.c AS c_hr
        |  FROM hourly a
        |  JOIN hourly w ON a.event_type = w.event_type
        |    AND w.h = a.h - INTERVAL 168 HOURS
        |  JOIN hourly p ON a.event_type = p.event_type
        |    AND p.h = a.h - INTERVAL 1 HOUR)
        |SELECT event_type, count(*) AS n_eval,
        |  sum(abs(c - c_wk))::DOUBLE / count(*)::DOUBLE AS mae_snaive,
        |  sum(abs(c - c_hr))::DOUBLE / count(*)::DOUBLE AS mae_naive1,
        |  sum(abs(c - c_wk))::DOUBLE
        |    / nullif(sum(abs(c - c_hr))::DOUBLE, 0.0) AS rel_mase
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin))
}
