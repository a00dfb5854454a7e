package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 2 — four operator classes still missing from the
  * surface:
  *
  *   - q_agg_bitmap_distinct: EXACT mergeable distinct counting via
  *     Spark's bitmap functions (`bitmap_bit_position` /
  *     `bitmap_construct_agg` / `bitmap_or_agg` / `bitmap_count`) — the
  *     ClickHouse/Doris bitmap-rollup pattern: distinct counts that
  *     re-aggregate without revisiting data AND without HLL's error bar
  *     (the exact counterpoint to q_agg_hll_union).
  *   - q_join_nearest_tolerance: nearest-in-time join (either
  *     direction) under a BOUNDED ±30 min tolerance — the
  *     `merge_asof(direction='nearest', tolerance=...)` variant
  *     (q_join_asof_nearest is the unbounded window-emulated nearest;
  *     this one composes the NATIVE as-of operator per direction plus
  *     one argmin, and unmatchable rows stay -1).
  *   - q_events_cep: MATCH_RECOGNIZE-shaped complex-event detection (a
  *     view→click→purchase funnel within 48 h, greedy, non-
  *     overlapping) run as an integer automaton FOLD — the sequence
  *     pattern operator SQL engines bolt on as a dedicated clause.
  *   - q_text_rouge: clipped-unigram ROUGE-1 P/R/F1 between adjacent
  *     docs — the summarization-eval overlap metric as a corpus query.
  *
  * Determinism: bitmaps and the CEP automaton are integer-exact; the
  * as-of argmin tie-breaks on (|Δt|, click_ts, click_id); ROUGE's
  * divisions are single IEEE ops over exact counts. The CEP fold packs
  * (state, count, anchor) and (type, ts) into BIGINTs so the SAME
  * lambda text folds on both engines (the q_dedup_suffixlcp
  * list_prepend-seed trick).
  */
object Round11Ops2 {

  /** 2^44 / 2^58 packing radixes for the CEP fold: anchor/ts ms values
    * (< 2^44), match count (< 2^14), state (0..2). */
  private val D44 = 17592186044416L
  private val D58 = 288230376151711744L

  /** CEP funnel window (ms) — shared with the streaming twin
    * (EventStreams.streamingCepFunnels) so batch and stream can never
    * drift on the timeout rule. */
  val CepWindowMs = 172800000L

  /** The CEP transition lambda body, rendered per engine (`div` vs
    * `//`). acc = st·2^58 + cnt·2^44 + anchor; e = ty·2^44 + tm with
    * ty 1=view, 2=click, 3=purchase. Greedy, non-overlapping, 48-hour
    * window from the anchoring view (the corpus inter-event gap is
    * ~10 h, so shorter windows never complete). */
  private def cepStep(div: String): String = {
    val st = s"(acc $div $D58)"
    val cnt = s"((acc $div $D44) % 16384)"
    val anchor = s"(acc % $D44)"
    val ty = s"(e $div $D44)"
    val tm = s"(e % $D44)"
    val timedOut = s"($st > 0 AND $tm - $anchor > $CepWindowMs)"
    val effSt = s"(CASE WHEN $timedOut THEN 0 ELSE $st END)"
    val effAnchor = s"(CASE WHEN $timedOut THEN 0 ELSE $anchor END)"
    s"""CASE
       |  WHEN $effSt = 0 AND $ty = 1 THEN ${D58}::BIGINT + $cnt * $D44 + $tm
       |  WHEN $effSt = 1 AND $ty = 2 THEN 2 * ${D58}::BIGINT + $cnt * $D44 + $effAnchor
       |  WHEN $effSt = 2 AND $ty = 3 THEN ($cnt + 1) * ${D44}::BIGINT
       |  ELSE $effSt * ${D58}::BIGINT + $cnt * $D44 + $effAnchor
       |END""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact mergeable distinct counts via bitmaps: user ids map to
    // (bucket, bit) positions, per-(type, bucket) bitmaps OR-aggregate,
    // and counts sum over buckets — all EXACT, and the per-type bucket
    // bitmaps re-aggregate to the all-types rollup by bitmap_or_agg
    // WITHOUT touching the fact table again (the sketch-cube property
    // q_agg_hll_union shows approximately, exactly). Scale shape: the
    // fact scan feeds one map-side-combined (type, bucket) aggregate
    // whose state is fixed 4 KB bitmaps; everything after is
    // bucket-bounded. The oracle states plain exact distincts — the
    // whole bitmap pipeline must reproduce them bit-for-bit.
    QueryDef("q_agg_bitmap_distinct",
      (s, d) => {
        val ev = Tables.events(s, d)
        val perBucket = ev.select(col("event_type"),
            expr("bitmap_bucket_number(user_id)").as("bkt"),
            expr("bitmap_bit_position(user_id)").as("pos"))
          .groupBy("event_type", "bkt")
          .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        val perType = perBucket.groupBy("event_type")
          .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
        val all = perBucket.groupBy("bkt")
          .agg(expr("bitmap_or_agg(bm)").as("bm"))
          .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
          .select(lit("__all__").as("event_type"), col("n_users"))
        perType.unionAll(all)
          .select(col("event_type"), col("n_users").cast("long").as("n_users"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
         FROM events GROUP BY event_type
         UNION ALL
         SELECT '__all__', count(DISTINCT user_id)::BIGINT FROM events
         ORDER BY event_type"""),

    // Bounded-tolerance nearest join: each error paired with the
    // CLOSEST click by |Δt| within ±30 min — the
    // merge_asof(direction='nearest', tolerance=30min) shape sensor
    // fusion and trade/quote matching need (the unbounded nearest
    // lives in q_join_asof_nearest as a window emulation; this is the
    // native-operator path). Composed Spark-first: the as-of operator
    // (plans/AsOfJoin, co-partitioned single-pass merge) runs once per
    // direction, then ONE argmin per error picks the winner — candidate
    // volume is ≤2 rows per error, not the ±window blowup a range join
    // would scan. Ties (equidistant before/after) break to the earlier
    // click then click_id; errors with no in-window click keep -1.
    QueryDef("q_join_nearest_tolerance",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"),
            date_trunc("MILLISECOND", col("ts")).as("err_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("c_user"),
            date_trunc("MILLISECOND", col("ts")).as("click_ts"))
          .agg(max("event_id").as("click_id"))
        val bwd = graft.ops.Joins.asofBackward(errors, clicks,
          Seq("user_id"), Seq("c_user"), "err_ts", "click_ts")
        val fwd = graft.ops.Joins.asofForward(errors, clicks,
          Seq("user_id"), Seq("c_user"), "err_ts", "click_ts")
        val delta = abs(unix_millis(col("click_ts")) - unix_millis(col("err_ts")))
        val cand = bwd.unionAll(fwd)
          .withColumn("d", when(col("click_id").isNotNull &&
            delta <= 1800000L, delta))
        cand.groupBy("user_id", "event_id", "err_ts")
          .agg(min(when(col("d").isNotNull,
            struct(col("d"), col("click_ts"), col("click_id")))).as("best"))
          .select(col("user_id"), col("event_id"), col("err_ts"),
            coalesce(col("best.click_id"), lit(-1L)).as("click_id"),
            coalesce(col("best.d"), lit(-1L)).as("delta_ms"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT user_id, event_id,
                    date_trunc('milliseconds', ts)::TIMESTAMP AS err_ts
             FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id AS c_user,
                    date_trunc('milliseconds', ts)::TIMESTAMP AS click_ts,
                    max(event_id) AS click_id
             FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         cand AS (
           SELECT e.user_id, e.event_id, e.err_ts, c.click_id, c.click_ts,
             abs(epoch_ms(c.click_ts) - epoch_ms(e.err_ts)) AS d
           FROM e JOIN c ON e.user_id = c.c_user
           WHERE abs(epoch_ms(c.click_ts) - epoch_ms(e.err_ts)) <= 1800000),
         pick AS (
           SELECT user_id, event_id, err_ts, click_id, d,
             row_number() OVER (PARTITION BY event_id
               ORDER BY d, click_ts, click_id) AS rn
           FROM cand)
         SELECT e.user_id, e.event_id, e.err_ts,
           COALESCE(p.click_id, -1) AS click_id,
           COALESCE(p.d, -1) AS delta_ms
         FROM e LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p
           ON e.event_id = p.event_id
         ORDER BY e.event_id"""),

    // Complex-event pattern detection (the MATCH_RECOGNIZE gap): per
    // user, count GREEDY NON-OVERLAPPING view→click→purchase funnels
    // completing within 48 hours of the anchoring view. The matcher is a
    // 3-state integer automaton folded over the user's time-ordered
    // event list — state, match count, and window anchor pack into one
    // BIGINT, so the IDENTICAL transition text folds on both engines
    // and the result is hash-exact. Scale shape: one combinable
    // collect per user (state bounded by per-user activity; the
    // secondary-sort mapPartitions bucket is the documented fallback
    // for pathological users), fold is in-row, output is user-bounded.
    QueryDef("q_events_cep",
      (s, d) => {
        val tyCode = when(col("event_type") === "view", 1L)
          .when(col("event_type") === "click", 2L)
          .when(col("event_type") === "purchase", 3L)
        val evs = Tables.events(s, d)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"),
            unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
            col("event_id"), tyCode.as("ty"))
        evs.groupBy("user_id")
          .agg(collect_list(struct(col("tm"), col("event_id"), col("ty")))
            .as("raw"))
          .withColumn("packed", expr(
            s"transform(array_sort(raw), s -> s.ty * $D44 + s.tm)"))
          .withColumn("acc", expr(
            s"aggregate(packed, CAST(0 AS BIGINT), (acc, e) -> ${cepStep("div")})"))
          .select(col("user_id"),
            expr(s"(acc div $D44) % 16384").as("n_funnels"),
            size(col("packed")).cast("long").as("n_events"))
          .orderBy("user_id")
      },
      s"""WITH evs AS (
        |  SELECT user_id,
        |    epoch_ms(date_trunc('milliseconds', ts)) AS tm, event_id,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         ELSE 3 END AS ty
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |folded AS (
        |  SELECT user_id,
        |    list_reduce(
        |      list_prepend(0::BIGINT, list(ty * $D44 + tm ORDER BY tm, event_id)),
        |      (acc, e) -> ${cepStep("//")}) AS acc,
        |    count(*) AS n_events
        |  FROM evs GROUP BY user_id)
        |SELECT user_id, (acc // $D44) % 16384 AS n_funnels,
        |  n_events::BIGINT AS n_events
        |FROM folded ORDER BY user_id""".stripMargin),

    // Clipped-unigram ROUGE-1 between adjacent docs (the
    // q_minhash_estimate pairing): overlap = Σ_w min(c1(w), c2(w)),
    // precision/recall against each side's token count, F1 guarded for
    // 0/0. The summarization-eval metric as a set-free corpus query:
    // per-doc word counts build in one combinable groupBy, pairs join
    // on adjacent ids, and every division is a single IEEE op over
    // exact BIGINTs. At corpus scale the pair relation is whatever the
    // dedup candidate generator emits — adjacency here keeps the
    // oracle total.
    QueryDef("q_text_rouge",
      (s, d) => {
        val wc = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val a = wc.select(col("doc_id").as("d1"), col("w"), col("c").as("c1"))
        val b = wc.select((col("doc_id") - 1L).as("d1"), col("w"),
          col("c").as("c2"))
        val tot = wc.groupBy("doc_id").agg(sum("c").as("n"))
        val overlap = a.join(b, Seq("d1", "w"))
          .groupBy("d1")
          .agg(sum(least(col("c1"), col("c2"))).as("ov"))
        tot.select(col("doc_id").as("d1"), col("n").as("n1"))
          .join(tot.select((col("doc_id") - 1L).as("d1"), col("n").as("n2")),
            Seq("d1"))
          .join(overlap, Seq("d1"), "left")
          .select(col("d1"), (col("d1") + 1L).as("d2"),
            coalesce(col("ov"), lit(0L)).cast("long").as("overlap"),
            col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
            (coalesce(col("ov"), lit(0L)).cast("double") /
              col("n2").cast("double")).as("rouge1_p"),
            (coalesce(col("ov"), lit(0L)).cast("double") /
              col("n1").cast("double")).as("rouge1_r"),
            (lit(2.0) * coalesce(col("ov"), lit(0L)).cast("double") /
              (col("n1") + col("n2")).cast("double")).as("rouge1_f"))
          .orderBy("d1")
      },
      """WITH wc AS (
        |  SELECT doc_id, w, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) t
        |  WHERE w <> '' GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n FROM wc GROUP BY 1),
        |ov AS (
        |  SELECT a.doc_id AS d1, sum(least(a.c, b.c)) AS ov
        |  FROM wc a JOIN wc b ON b.doc_id = a.doc_id + 1 AND a.w = b.w
        |  GROUP BY 1)
        |SELECT t1.doc_id AS d1, t1.doc_id + 1 AS d2,
        |  coalesce(ov.ov, 0)::BIGINT AS overlap,
        |  t1.n::BIGINT AS n1, t2.n::BIGINT AS n2,
        |  coalesce(ov.ov, 0)::DOUBLE / t2.n::DOUBLE AS rouge1_p,
        |  coalesce(ov.ov, 0)::DOUBLE / t1.n::DOUBLE AS rouge1_r,
        |  2.0 * coalesce(ov.ov, 0)::DOUBLE / (t1.n + t2.n)::DOUBLE AS rouge1_f
        |FROM tot t1 JOIN tot t2 ON t2.doc_id = t1.doc_id + 1
        |LEFT JOIN ov ON ov.d1 = t1.doc_id
        |ORDER BY d1""".stripMargin),
  )
}
