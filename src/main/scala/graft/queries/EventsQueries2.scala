package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 event-analytics closers: the concurrency curve (peak-load /
  * capacity view of the session family) and DAU/WAU engagement with
  * stickiness — the two product-analytics aggregates still missing
  * around funnels / cohorts / paths / transitions.
  *
  * Both sessionize with the SAME 10-minute-gap islands as
  * q_window_session / q_events_paths (one user-keyed sort; (ms-truncated
  * ts, event_id) pins order) so the session universes agree across the
  * whole family.
  */
object EventsQueries2 {

  /** Shared sessionizer SQL (user_id, sid, st, en) — min/max ms-truncated
    * ts per 10-minute-gap island. */
  private val sessSql =
    """e AS (
      |  SELECT user_id, event_id,
      |    date_trunc('milliseconds', ts) AS tsm
      |  FROM events),
      |b AS (
      |  SELECT *, CASE WHEN lag(tsm) OVER w IS NULL
      |                   OR tsm >= lag(tsm) OVER w + INTERVAL 10 MINUTE
      |            THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
      |sid AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id
      |    ORDER BY tsm, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM b),
      |sess AS (
      |  SELECT user_id, sid, min(tsm) AS st, max(tsm) AS en
      |  FROM sid GROUP BY 1, 2)""".stripMargin

  /** Spark twin of [[sessSql]]: the break flag and running session id
    * come from the family's shared staged adjacency frame
    * ([[EventAdjacency]] — one user-keyed sort, staged once per session
    * in bench mode), collapsed here to one (st, en) row per island. */
  private def sessFrame(s: org.apache.spark.sql.SparkSession, d: String) =
    EventAdjacency.frame(s, d)
      .groupBy("user_id", "sid")
      .agg(min("tsm").as("st"), max("tsm").as("en"))

  val defs: Seq[QueryDef] = Seq(

    // Session concurrency curve: how many sessions are active in each
    // hour — the capacity-planning / peak-load view every serving team
    // asks of an event warehouse. A session is active in every hour its
    // [st, en] span touches.
    //
    // Scale shape: sessions collapse to ONE (st, en) row each before
    // any expansion, and the hour explode is bounded by session
    // DURATION in hours (gap-bounded sessions are short by
    // construction — a 10-minute-gap session spanning h hours needs
    // ≥ 6h events, so the explode is amortized O(events/6) worst
    // case, not span-of-corpus like a naive time grid). The final
    // count is a map-side-combined groupBy on the hour key. No global
    // sort, no interval self-join, no +1/-1 global prefix sum (that
    // alternative needs a corpus-wide ordered window; the grid
    // explode keeps everything partition-local until one short-key
    // shuffle).
    QueryDef("q_events_concurrency",
      (s, d) => sessFrame(s, d)
        .select(explode(sequence(date_trunc("hour", col("st")),
          date_trunc("hour", col("en")), expr("interval 1 hour"))).as("h"))
        .groupBy("h").agg(count(lit(1)).as("n_active"))
        .orderBy("h"),
      s"""WITH $sessSql
         |SELECT h::TIMESTAMP AS h, count(*) AS n_active
         |FROM (SELECT unnest(generate_series(date_trunc('hour', st),
         |               date_trunc('hour', en), INTERVAL 1 HOUR)) AS h
         |      FROM sess)
         |GROUP BY 1 ORDER BY h""".stripMargin),

    // DAU / WAU engagement: distinct active users per day, trailing
    // 7-day distinct actives, and stickiness = DAU/WAU — the retention
    // dashboard's headline trio. Exact (the sketch twin at unbounded
    // user cardinality is the q_window_countdistinct_approx HLL path).
    //
    // The WAU rewrite is contribution explode, not a range self-join:
    // each (user, day) activity row contributes to the 7 target days
    // [day, day+6] with its offset carried along, and ONE aggregation
    // computes both counts — WAU = countDistinct(user), DAU =
    // countDistinct(user where offset = 0). Single events scan, one
    // (user, day) distinct, a fixed ×7 explode, one Expand-planned
    // two-distinct aggregate — no second scan, no dau⋈wau join (the
    // first formulation read the corpus twice; `.explain` showed two
    // parquet scans with no exchange reuse). Target days with no
    // activity of their own (dau = 0) drop — a day without events has
    // no DAU row, and its WAU would mislead anyway.
    QueryDef("q_events_engagement",
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .distinct()
        ud.select(col("user_id"), col("day"),
            explode(sequence(lit(0), lit(6))).as("off"))
          .groupBy((col("day") + col("off") * expr("interval 1 day")).as("day"))
          .agg(countDistinct(when(col("off") === 0, col("user_id"))).as("dau"),
            countDistinct(col("user_id")).as("wau"))
          .filter(col("dau") > 0)
          .select(col("day"), col("dau"), col("wau"),
            (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
          .orderBy("day")
      },
      """WITH ud AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |c AS (
        |  SELECT user_id, day + to_days(off::INTEGER) AS day, off
        |  FROM ud, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(off)),
        |g AS (
        |  SELECT day, count(DISTINCT CASE WHEN off = 0 THEN user_id END) AS dau,
        |    count(DISTINCT user_id) AS wau
        |  FROM c GROUP BY 1)
        |SELECT day::TIMESTAMP AS day, dau, wau,
        |  dau::DOUBLE / wau::DOUBLE AS stickiness
        |FROM g WHERE dau > 0
        |ORDER BY day""".stripMargin),

    // Time-weighted average value per user — the correct mean for
    // irregular observations (IoT gauges, account balances, prices):
    // each reading's value holds until the NEXT reading, so it weighs
    // by its holding interval. The arithmetic mean over-weights bursts;
    // TWA is what billing/risk systems actually need.
    //
    // Determinism: holding intervals are exact epoch-ms BIGINTs from
    // the lead() chain under the pinned (ms-truncated ts, event_id)
    // order; values clamp to DECIMAL(18,2) first (the repo's dsum
    // idiom), so weight sums are EXACT decimal arithmetic on both
    // engines and the final TWA is a single double division. The last
    // reading per user has no holding interval and contributes no
    // weight (standard left-closed convention).
    //
    // Scale shape: one user-keyed sort carries the lead() chain, one
    // partial-aggregated groupBy collapses to a row per user — the
    // same single-exchange shape as the sessionizer.
    QueryDef("q_events_twa",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            date_trunc("MILLISECOND", col("ts")).as("tsm"),
            col("value").cast("decimal(18,2)").as("v"))
          .withColumn("dt_ms",
            (unix_millis(lead("tsm", 1).over(w)) - unix_millis(col("tsm"))))
          .filter(col("dt_ms").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum("dt_ms").as("total_ms"),
            sum(col("v") * col("dt_ms")).as("wsum"))
          .select(col("user_id"), col("n_intervals"), col("total_ms"),
            (col("wsum").cast("double") / col("total_ms").cast("double"))
              .as("twa_value"))
          .orderBy("user_id")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, date_trunc('milliseconds', ts) AS tsm,
        |    value::DECIMAL(18,2) AS v
        |  FROM events),
        |iv AS (
        |  SELECT user_id, v,
        |    epoch_ms(lead(tsm) OVER w) - epoch_ms(tsm) AS dt_ms
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
        |g AS (
        |  SELECT user_id, count(*) AS n_intervals, sum(dt_ms)::BIGINT AS total_ms,
        |    sum(v * dt_ms) AS wsum
        |  FROM iv WHERE dt_ms IS NOT NULL
        |  GROUP BY 1)
        |SELECT user_id, n_intervals, total_ms,
        |  wsum::DOUBLE / total_ms::DOUBLE AS twa_value
        |FROM g ORDER BY user_id""".stripMargin),

    // Per-user token-bucket rate limiting — the admission-control
    // recurrence (tokens = min(cap, prev + elapsed·rate) − cost·allowed)
    // is NOT window-expressible (min-clamp makes the scan non-
    // associative), so it runs as the SECONDARY-SORT pattern:
    // repartition by user, sortWithinPartitions by (user, ts, id), one
    // O(1)-state mapPartitions pass. No per-group materialization —
    // a user's events stream through the iterator, so a billion-event
    // user costs memory O(1), unlike groupByKey+sort-in-memory. The
    // same recurrence is the flatMapGroupsWithState streaming shape.
    // Integer micro-tokens (cap 5 tokens = 5e6, cost 1e6, refill 100
    // per ms = 0.1 tokens/s) keep the clamp arithmetic exact; the
    // oracle replays the recurrence as a per-user recursive CTE.
    QueryDef("q_events_ratelimit",
      (s, d) => {
        import s.implicits._
        val CAP = 5000000L; val COST = 1000000L; val RATE = 100L
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("unix_millis(date_trunc('MILLISECOND', ts))").as("tms"))
          .as[(Long, Long, Long)]
          .repartition(col("user_id"))
          .sortWithinPartitions("user_id", "tms", "event_id")
          .mapPartitions { it =>
            var curUser = 0L
            var tokens = 0L
            var prevT = 0L
            var first = true
            it.map { case (eid, uid, tms) =>
              if (first || uid != curUser) {
                curUser = uid; tokens = CAP; first = false
              } else {
                tokens = math.min(CAP, tokens + (tms - prevT) * RATE)
              }
              prevT = tms
              val allowed = tokens >= COST
              if (allowed) tokens -= COST
              (eid, uid, allowed, tokens)
            }
          }
          .toDF("event_id", "user_id", "allowed", "tokens_after")
          .orderBy("event_id")
      },
      """WITH RECURSIVE base AS (
        |  SELECT event_id, user_id,
        |    epoch_ms(date_trunc('milliseconds', ts)) AS tms,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(date_trunc('milliseconds', ts)), event_id) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT user_id, rn, event_id, tms,
        |    true AS allowed, 4000000::BIGINT AS tokens_after
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.rn, b.event_id, b.tms,
        |    least(5000000, r.tokens_after + (b.tms - r.tms) * 100)
        |      >= 1000000 AS allowed,
        |    least(5000000, r.tokens_after + (b.tms - r.tms) * 100)
        |      - CASE WHEN least(5000000,
        |          r.tokens_after + (b.tms - r.tms) * 100) >= 1000000
        |        THEN 1000000 ELSE 0 END AS tokens_after
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT event_id, user_id, allowed, tokens_after
        |FROM rec ORDER BY event_id""".stripMargin),

    // Weekly seasonality profile: (weekday × hour) activity heatmap with
    // per-cell share — the load-shaping / staffing / anomaly-baseline
    // view. Weekday uses the ISO-Monday=0 convention on BOTH engines
    // (Spark weekday() ≡ DuckDB isodow−1; the engines' dayofweek()
    // disagree on Sunday). One map-side-combined groupBy over 168
    // cells; the total rides back as a broadcast 1-row frame; share is
    // one IEEE division of exact BIGINTs.
    QueryDef("q_events_seasonality",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(weekday(col("ts")).cast("long").as("wd"),
            hour(col("ts")).cast("long").as("hh"))
          .groupBy("wd", "hh")
          .agg(count(lit(1)).as("cnt"))
        val tot = cells.agg(sum(col("cnt")).as("total"))
        cells.join(broadcast(tot))
          .select(col("wd"), col("hh"), col("cnt"),
            (col("cnt").cast("double") / col("total").cast("double")).as("share"))
          .orderBy("wd", "hh")
      },
      """WITH cells AS (
        |  SELECT (isodow(ts) - 1)::BIGINT AS wd, hour(ts)::BIGINT AS hh,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT sum(cnt) AS total FROM cells)
        |SELECT wd, hh, cnt, cnt::DOUBLE / total::DOUBLE AS share
        |FROM cells, t ORDER BY wd, hh""".stripMargin),

    // A/B experiment readout: users split by the standard deterministic
    // id-hash assignment (parity here — the corpus has no variant
    // column), conversion = a repeat-purchaser flag (>= 13 purchase
    // events — "any purchase" saturates to 100% on this dense corpus,
    // degenerating the pooled variance to 0), output per-variant
    // rates plus lift and the two-proportion z statistic. The per-user
    // conversion flag is ONE map-side-combined boolean aggregate; the
    // 2-row variant rollup and the final stats are driver-trivial.
    // Every input to the z formula is an exact BIGINT, the pooled-rate
    // expression is written identically on both engines, so the
    // statistic hash-matches bit-for-bit.
    QueryDef("q_events_abtest",
      (s, d) => {
        val perUser = Tables.events(s, d)
          .select(col("user_id"), (col("user_id") % 2).as("variant"),
            (col("event_type") === "purchase").cast("int").as("is_purchase"))
          .groupBy("user_id", "variant")
          .agg((sum(col("is_purchase")) >= 13).cast("long").as("converted"))
        val v = perUser.groupBy("variant")
          .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
        val a = v.filter(col("variant") === 0)
          .select(col("n").as("n0"), col("c").as("c0"))
        val b = v.filter(col("variant") === 1)
          .select(col("n").as("n1"), col("c").as("c1"))
        a.crossJoin(broadcast(b))
          .withColumn("r0", col("c0").cast("double") / col("n0").cast("double"))
          .withColumn("r1", col("c1").cast("double") / col("n1").cast("double"))
          .withColumn("pooled",
            (col("c0") + col("c1")).cast("double") /
              (col("n0") + col("n1")).cast("double"))
          .select(col("n0"), col("c0"), col("n1"), col("c1"),
            col("r0"), col("r1"),
            // nullif guards: a degenerate corpus (zero converters in
            // variant 0, or 0%/100% pooled) must yield NULL on BOTH
            // engines, not Spark-NULL vs DuckDB-inf (ADVICE r9).
            (col("r1") / nullif(col("r0"), lit(0.0)) - lit(1.0)).as("lift"),
            ((col("r1") - col("r0")) /
              nullif(sqrt(col("pooled") * (lit(1.0) - col("pooled")) *
                (lit(1.0) / col("n0").cast("double") +
                  lit(1.0) / col("n1").cast("double"))), lit(0.0)))
              .as("z_stat"))
      },
      """WITH pu AS (
        |  SELECT user_id, (user_id % 2) AS variant,
        |    (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 13)::BIGINT
        |      AS converted
        |  FROM events GROUP BY 1, 2),
        |v AS (SELECT variant, count(*) AS n, sum(converted)::BIGINT AS c
        |      FROM pu GROUP BY 1),
        |a AS (SELECT n AS n0, c AS c0 FROM v WHERE variant = 0),
        |b AS (SELECT n AS n1, c AS c1 FROM v WHERE variant = 1),
        |j AS (
        |  SELECT n0, c0, n1, c1,
        |    c0::DOUBLE / n0::DOUBLE AS r0, c1::DOUBLE / n1::DOUBLE AS r1,
        |    (c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE AS pooled
        |  FROM a, b)
        |SELECT n0, c0, n1, c1, r0, r1,
        |  r1 / nullif(r0, 0.0) - 1.0 AS lift,
        |  (r1 - r0) / nullif(sqrt(pooled * (1.0 - pooled)
        |    * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)), 0.0) AS z_stat
        |FROM j""".stripMargin),

    // Exponentially weighted moving average per user (α = 1/2) — the
    // smoothing/forecast-baseline recurrence (simple exponential
    // smoothing's fitted level). Like the token bucket, the recurrence
    // sₜ = α·vₜ + (1−α)·sₜ₋₁ is non-associative, so it runs as the
    // SECONDARY-SORT scan (repartition by user, sortWithinPartitions,
    // O(1) state); unlike the bucket it is float-valued — determinism
    // holds because BOTH engines evaluate the identical IEEE sequence
    // in the identical per-user order (0.5·v + 0.5·s, ms-truncated
    // (ts, event_id) order), which the recursive-CTE oracle replays.
    // Output sampled to each user's LAST state row to keep the
    // verified surface user-proportional.
    QueryDef("q_events_ewma",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("unix_millis(date_trunc('MILLISECOND', ts))").as("tms"),
            col("value"))
          .as[(Long, Long, Long, Double)]
          .repartition(col("user_id"))
          .sortWithinPartitions("user_id", "tms", "event_id")
          .mapPartitions { it =>
            var curUser = 0L
            var sLevel = 0.0
            var n = 0L
            var first = true
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            var pendingUser = 0L
            var havePending = false
            def flush(): Unit =
              if (havePending) { out += ((pendingUser, n, sLevel)); havePending = false }
            it.foreach { case (_, uid, _, v) =>
              if (first || uid != curUser) {
                flush()
                curUser = uid; sLevel = v; n = 1L; first = false
              } else {
                sLevel = 0.5 * v + 0.5 * sLevel
                n += 1
              }
              pendingUser = uid; havePending = true
            }
            flush()
            out.iterator
          }
          .toDF("user_id", "n_events", "ewma_last")
          .orderBy("user_id")
      },
      """WITH RECURSIVE base AS (
        |  SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(date_trunc('milliseconds', ts)), event_id) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT user_id, rn, value::DOUBLE AS s
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.rn, 0.5 * b.value::DOUBLE + 0.5 * r.s AS s
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1),
        |last AS (
        |  SELECT user_id, max(rn) AS n_events FROM base GROUP BY user_id)
        |SELECT l.user_id, l.n_events, r.s AS ewma_last
        |FROM last l JOIN rec r ON r.user_id = l.user_id AND r.rn = l.n_events
        |ORDER BY l.user_id""".stripMargin),

    // CUSUM change-point detection per event_type over hourly value
    // sums — the drift detector a data pipeline runs on a metric
    // before trusting a time-split. INTEGER-DETERMINISTIC throughout
    // (the q_graph_pagerank technique): values become micro-units via
    // floor (cast double->long truncates toward zero in Spark but
    // rounds in DuckDB — floor first is exact in both), and the
    // classic S_k = prefix_k - k·mean statistic is multiplied through
    // by n_buckets so the mean never becomes a rational:
    // S'_k = nb·prefix_k - k·total, exact BIGINT (bounded by
    // nb·total ≈ 1e15 at sf0.1 — switch to DECIMAL(38,0) if a corpus
    // ever pushes nb·total past 2^63). Scale shape: one map-side-
    // combined groupBy to hourly buckets, per-type windows over the
    // BOUNDED bucket series (hours-in-span rows, not events), and a
    // |types|-row broadcast join for totals.
    QueryDef("q_events_changepoint",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hb = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            floor(col("value") * 1000000).cast("long").as("v"))
          .groupBy("event_type", "h")
          .agg(sum("v").as("x"), count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("h")
        val tot = hb.groupBy("event_type")
          .agg(sum("x").as("tx"), count(lit(1)).as("nb"),
            sum("c").as("n_events"))
        val sk = hb
          .withColumn("k", row_number().over(w).cast("long"))
          .withColumn("px", sum("x").over(w))
          .join(broadcast(tot), "event_type")
          .select(col("event_type"), col("h"), col("k"), col("nb"),
            col("n_events"),
            (col("nb") * col("px") - col("k") * col("tx")).as("s"))
        val pick = Window.partitionBy("event_type")
          .orderBy(abs(col("s")).desc, col("h").asc)
        sk.withColumn("rk", row_number().over(pick))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("h").as("cp_hour"),
            col("k").as("cp_k"), col("nb"), col("n_events"), col("s"))
          .orderBy("event_type")
      },
      """WITH hb AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(floor(value * 1000000)::BIGINT) AS x, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, sum(x) AS tx, count(*) AS nb,
        |    sum(c) AS n_events
        |  FROM hb GROUP BY 1),
        |sk AS (
        |  SELECT hb.event_type, hb.h,
        |    row_number() OVER (PARTITION BY hb.event_type ORDER BY hb.h)::BIGINT AS k,
        |    t.nb::BIGINT AS nb, t.n_events::BIGINT AS n_events,
        |    (t.nb * sum(hb.x) OVER (PARTITION BY hb.event_type ORDER BY hb.h)
        |      - row_number() OVER (PARTITION BY hb.event_type ORDER BY hb.h) * t.tx)::BIGINT AS s
        |  FROM hb JOIN tot t USING (event_type)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(s) DESC, h ASC) AS rk
        |  FROM sk)
        |SELECT event_type, h AS cp_hour, k AS cp_k, nb, n_events, s
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin),

    // Largest-Triangle-One-Bucket time-series downsampling: reduce each
    // event_type's series to 64 representative points, keeping per
    // bucket the point forming the largest triangle with its immediate
    // series neighbors — the standard visual-fidelity downsampler
    // (LTOB; the parallel-friendly sibling of LTTB, whose selected-
    // point chain is inherently sequential). INTEGER-DETERMINISTIC:
    // values in floor-micro-units, x-axis is the per-type ordinal, and
    // the doubled triangle area |(k-1 − k+1)(v − v-1) − (k-1 − k)(v+1 − v-1)|
    // is exact BIGINT (neighbor ordinals differ by 2). Scale shape:
    // one per-type sort window for ordinals/neighbors (events shuffle
    // once on type... at 100 TB partitionBy would add (type, day) to
    // bound partitions), then a WindowGroupLimit-prunable per-bucket
    // argmax. Output is 64·|types| rows regardless of input size.
    QueryDef("q_events_downsample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val B = 64
        val w = Window.partitionBy("event_type").orderBy("k")
        val base = Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            date_trunc("millisecond", col("ts")).as("ts"),
            floor(col("value") * 1000000).cast("long").as("v"))
          .withColumn("k", row_number().over(Window.partitionBy("event_type")
            .orderBy(col("ts"), col("event_id"))).cast("long"))
        val nper = base.groupBy("event_type").agg(count(lit(1)).as("n"))
        val area = base
          .withColumn("vp", lag("v", 1).over(w))
          .withColumn("vn", lead("v", 1).over(w))
          .filter(col("vp").isNotNull && col("vn").isNotNull)
          .join(broadcast(nper), "event_type")
          .select(col("event_type"), col("event_id"), col("ts"), col("k"),
            col("v"),
            expr(s"(k - 1) * $B div n").as("bucket"),
            abs(lit(-2) * (col("v") - col("vp")) +
              (col("vn") - col("vp"))).as("area2"))
        val pick = Window.partitionBy("event_type", "bucket")
          .orderBy(col("area2").desc, col("k").asc)
        area.withColumn("rk", row_number().over(pick))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("bucket"), col("k"), col("event_id"),
            col("ts"), col("v"), col("area2"))
          .orderBy("event_type", "bucket")
      },
      """WITH base AS (
        |  SELECT event_type, event_id, date_trunc('milliseconds', ts) AS ts,
        |    floor(value * 1000000)::BIGINT AS v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY date_trunc('milliseconds', ts), event_id)::BIGINT AS k
        |  FROM events),
        |nper AS (SELECT event_type, count(*) AS n FROM base GROUP BY 1),
        |area AS (
        |  SELECT b.event_type, b.event_id, b.ts, b.k, b.v,
        |    (b.k - 1) * 64 // p.n AS bucket,
        |    abs(-2 * (b.v - lag(b.v) OVER w) +
        |        (lead(b.v) OVER w - lag(b.v) OVER w))::BIGINT AS area2
        |  FROM base b JOIN nper p USING (event_type)
        |  WINDOW w AS (PARTITION BY b.event_type ORDER BY b.k)
        |  QUALIFY lag(b.v) OVER w IS NOT NULL AND lead(b.v) OVER w IS NOT NULL),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY area2 DESC, k ASC) AS rk
        |  FROM area)
        |SELECT event_type, bucket, k, event_id, ts, v, area2
        |FROM r WHERE rk = 1 ORDER BY event_type, bucket""".stripMargin),

    // Theil–Sen robust trend per event_type: the median of pairwise
    // slopes over the HOURLY series — outlier-resistant where OLS is
    // not. The all-pairs step is bounded by the series length (hours
    // in span: ~720² / 2 pairs per type), never by event count — the
    // aggregation to hourly buckets happens first, so corpus growth
    // changes bucket VALUES, not pair volume. Slopes are one double
    // division of exact integers (identical IEEE order both engines);
    // the median is the LOWER median picked by row_number over
    // (slope, i, j) — no averaging of two middle doubles, so the
    // result is always an actually-occurring slope and ties are
    // broken stably.
    QueryDef("q_events_trend",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // hourly frame checkpointed eagerly (r17 optimization round):
        // it is bucket-bounded (~hundreds of rows per type) and feeds
        // both pair sides — without it the corpus aggregation + window
        // re-ran per consumer. Content unchanged.
        val hb = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            floor(col("value") * 1000000).cast("long").as("v"))
          .groupBy("event_type", "h").agg(sum("v").as("x"))
          .withColumn("k", row_number().over(Window.partitionBy("event_type")
            .orderBy("h")).cast("long"))
          .localCheckpoint(eager = true)
        // Probe side rebalanced: hb is a handful of in-memory blocks, so
        // the ~1.2M-row pair expansion ran in as many tasks as blocks.
        val pairs = Tables.balanced(hb).as("a").join(hb.as("b"),
            expr("a.event_type = b.event_type AND a.k < b.k"))
          .select(col("a.event_type").as("event_type"),
            col("a.k").as("i"), col("b.k").as("j"),
            ((col("b.x") - col("a.x")).cast("double") /
              (col("b.k") - col("a.k")).cast("double")).as("slope"))
        // n_pairs = C(n, 2) per type, derived from the hourly counts —
        // k ranges 1..n and the join keeps exactly the k_a < k_b pairs,
        // so the count is n·(n−1)/2 arithmetically (exact BIGINTs,
        // identical values); saves a full second pass over the pair
        // stream (r17 optimization round).
        val m = hb.groupBy("event_type").agg(count(lit(1)).as("nh"))
          .select(col("event_type"),
            expr("(nh * (nh - 1)) div 2").as("n_pairs"))
        // Sharded exact median (r17 optimization round): the old global
        // row_number sorted the full ~1.2M-row pair stream in one task
        // per event_type. Instead: slope-range-bucket each pair (any
        // monotone bucket function preserves the (slope, i, j) global
        // order ACROSS buckets — equal slopes share a bucket, so the
        // global rank-r row is the (r − count-before-bucket)-th row of
        // its bucket in the same order), count per bucket, locate the
        // median's bucket via a B-bounded prefix sum, and sort ONLY
        // that bucket. The picked row and every output value are
        // bit-identical; the pair stream is re-probed instead of
        // sorted (it is a cheap broadcast expansion of the
        // checkpointed hourly frame).
        val stats = pairs.groupBy("event_type")
          .agg(min("slope").as("lo"), max("slope").as("hi"))
        def bucketed(p: org.apache.spark.sql.DataFrame) =
          p.join(broadcast(stats), "event_type")
            .withColumn("bkt", when(col("hi") <= col("lo"), lit(0L))
              .otherwise(least(lit(4095L),
                floor((col("slope") - col("lo")) / (col("hi") - col("lo"))
                  * lit(4096.0)).cast("long"))))
        val cumW = Window.partitionBy("event_type").orderBy("bkt")
        val tgt = bucketed(pairs).groupBy("event_type", "bkt")
          .agg(count(lit(1)).as("c"))
          .withColumn("cumb", sum("c").over(cumW) - col("c"))
          .join(broadcast(m), "event_type")
          .withColumn("r", expr("(n_pairs + 1) div 2"))
          .filter(col("cumb") < col("r") && col("r") <= col("cumb") + col("c"))
          .select(col("event_type"), col("bkt"), col("cumb"), col("r"),
            col("n_pairs"))
        val pick = Window.partitionBy("event_type")
          .orderBy(col("slope").asc, col("i").asc, col("j").asc)
        bucketed(pairs).join(broadcast(tgt), Seq("event_type", "bkt"))
          .withColumn("rk", row_number().over(pick).cast("long"))
          .filter(col("rk") === col("r") - col("cumb"))
          .select(col("event_type"), col("n_pairs"),
            col("slope").as("median_slope_micro_per_hour"))
          .orderBy("event_type")
      },
      """WITH hb AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(floor(value * 1000000)::BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |kb AS (
        |  SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h)::BIGINT AS k
        |  FROM hb),
        |pairs AS (
        |  SELECT a.event_type, a.k AS i, b.k AS j,
        |    (b.x - a.x)::DOUBLE / (b.k - a.k)::DOUBLE AS slope
        |  FROM kb a JOIN kb b ON a.event_type = b.event_type AND a.k < b.k),
        |m AS (SELECT event_type, count(*) AS n_pairs FROM pairs GROUP BY 1),
        |r AS (
        |  SELECT p.event_type, p.slope, m.n_pairs::BIGINT AS n_pairs,
        |    row_number() OVER (PARTITION BY p.event_type
        |      ORDER BY p.slope ASC, p.i ASC, p.j ASC)::BIGINT AS rk
        |  FROM pairs p JOIN m USING (event_type))
        |SELECT event_type, n_pairs, slope AS median_slope_micro_per_hour
        |FROM r WHERE rk = (n_pairs + 1) // 2 ORDER BY event_type""".stripMargin),

    // OHLC resampling — the canonical time-series downsample for any
    // metered value: per (type, hour), the opening/high/low/closing
    // value plus volume. Open/close are picked by row_number over the
    // in-bucket order ((ts, event_id) — unique, so ties can't flip),
    // high/low/volume are plain map-side-combined aggregates, and
    // values stay exact floor-micro BIGINTs end to end. One window +
    // one groupBy, both partitioned by (type, hour) — embarrassingly
    // parallel at any scale; output is bucket-bounded, not
    // event-bounded.
    QueryDef("q_events_ohlc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type", "h")
          .orderBy(col("ts"), col("event_id"))
        val wd = Window.partitionBy("event_type", "h")
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            date_trunc("millisecond", col("ts")).as("ts"), col("event_id"),
            floor(col("value") * 1000000).cast("long").as("v"))
          .withColumn("rn_f", row_number().over(w))
          .withColumn("rn_l", row_number().over(wd))
          .groupBy("event_type", "h")
          .agg(max(when(col("rn_f") === 1, col("v"))).as("open"),
            max("v").as("high"), min("v").as("low"),
            max(when(col("rn_l") === 1, col("v"))).as("close"),
            count(lit(1)).as("volume"))
          .orderBy("event_type", "h")
      },
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    date_trunc('milliseconds', ts) AS tsm, event_id,
        |    floor(value * 1000000)::BIGINT AS v
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, h
        |      ORDER BY tsm, event_id) AS rn_f,
        |    row_number() OVER (PARTITION BY event_type, h
        |      ORDER BY tsm DESC, event_id DESC) AS rn_l
        |  FROM e)
        |SELECT event_type, h,
        |  max(CASE WHEN rn_f = 1 THEN v END) AS open,
        |  max(v) AS high, min(v) AS low,
        |  max(CASE WHEN rn_l = 1 THEN v END) AS close,
        |  count(*) AS volume
        |FROM r GROUP BY 1, 2 ORDER BY event_type, h""".stripMargin),

    // Stationary distribution of the session transition chain — "where
    // does a user's session settle?" — by 4 rounds of power iteration
    // on the q_events_transitions count matrix. INTEGER-DETERMINISTIC
    // (the q_graph_pagerank technique): mass in micro-units, each
    // contribution is `(mass * n) div row_total` — exact, order-
    // independent integral arithmetic, so the DuckDB oracle (the same
    // four rounds unrolled as CTEs) hash-matches bit-for-bit; floor
    // leakage stays (it is the documented cost of exactness and is
    // identical on both engines). Scale shape: the count matrix is
    // |types|² — driver-small at ANY corpus size — so every round is
    // a broadcast join + map-side-combined groupBy over a bounded
    // frame; only the one pass that builds the matrix touches events.
    QueryDef("q_events_stationary",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            date_trunc("MILLISECOND", col("ts")).as("tsm"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .withColumn("prev_tsm", lag("tsm", 1).over(w))
          .filter(col("prev_tsm").isNotNull &&
            col("tsm") < col("prev_tsm") + expr("interval 10 minutes"))
          .groupBy(col("prev_type").as("from_type"),
            col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rowtot",
            sum("n").over(Window.partitionBy("from_type")))
          .localCheckpoint(eager = false)
        val states = trans.select(col("from_type").as("state")).distinct()
          .localCheckpoint(eager = false)
        val nStates = states.groupBy().agg(count(lit(1)).as("ns"))
        var pi = states.crossJoin(broadcast(nStates))
          .select(col("state"), expr("1000000L div ns").as("mass"))
        for (_ <- 1 to 4) {
          pi = trans
            .join(pi.withColumnRenamed("state", "from_type"), "from_type")
            .select(col("to_type").as("state"),
              expr("(mass * n) div rowtot").as("contrib"))
            .groupBy("state").agg(sum("contrib").as("mass"))
            // inner-join back to the from-state set: mass entering a
            // state that never transitions OUT would otherwise vanish
            // from the next round's matrix join implicitly — keep the
            // restriction explicit and identical in the oracle
            .join(states, "state")
            .localCheckpoint(eager = false)
        }
        pi.select(col("state"), col("mass")).orderBy("state")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    date_trunc('milliseconds', ts) AS tsm
        |  FROM events),
        |l AS (
        |  SELECT *, lag(event_type) OVER w AS prev_type,
        |    lag(tsm) OVER w AS prev_tsm
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
        |t AS (
        |  SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
        |  FROM l
        |  WHERE prev_tsm IS NOT NULL AND tsm < prev_tsm + INTERVAL 10 MINUTE
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT from_type, to_type, n,
        |    sum(n) OVER (PARTITION BY from_type) AS rowtot
        |  FROM t),
        |states AS (SELECT DISTINCT from_type AS state FROM tr),
        |p0 AS (
        |  SELECT state, 1000000 // (SELECT count(*) FROM states) AS mass
        |  FROM states),
        |p1 AS (
        |  SELECT tr.to_type AS state, sum((p.mass * tr.n) // tr.rowtot) AS mass
        |  FROM tr JOIN p0 p ON tr.from_type = p.state GROUP BY 1),
        |p1s AS (SELECT p1.state, p1.mass FROM p1 JOIN states USING (state)),
        |p2 AS (
        |  SELECT tr.to_type AS state, sum((p.mass * tr.n) // tr.rowtot) AS mass
        |  FROM tr JOIN p1s p ON tr.from_type = p.state GROUP BY 1),
        |p2s AS (SELECT p2.state, p2.mass FROM p2 JOIN states USING (state)),
        |p3 AS (
        |  SELECT tr.to_type AS state, sum((p.mass * tr.n) // tr.rowtot) AS mass
        |  FROM tr JOIN p2s p ON tr.from_type = p.state GROUP BY 1),
        |p3s AS (SELECT p3.state, p3.mass FROM p3 JOIN states USING (state)),
        |p4 AS (
        |  SELECT tr.to_type AS state, sum((p.mass * tr.n) // tr.rowtot) AS mass
        |  FROM tr JOIN p3s p ON tr.from_type = p.state GROUP BY 1),
        |p4s AS (SELECT p4.state, p4.mass::BIGINT AS mass
        |        FROM p4 JOIN states USING (state))
        |SELECT state, mass FROM p4s ORDER BY state""".stripMargin),

    // Gaps-and-islands: longest consecutive-active-day streak per user
    // — the canonical `day − row_number()` grouping idiom (consecutive
    // days share the difference; any gap shifts it). Everything is
    // exact integer epoch-days; the reduce-to-(user, day) distinct is
    // the only event-scaled step, after which windows and rollups run
    // on the users × active-days frame (bounded by span, not events).
    QueryDef("q_events_streaks",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val days = Tables.events(s, d)
          .select(col("user_id"),
            datediff(col("ts"), lit("1970-01-01").cast("date"))
              .cast("long").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        val streaks = days
          .withColumn("grp", col("day") - row_number().over(w))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"), min("day").as("start_day"))
        streaks.groupBy("user_id")
          .agg(sum("len").as("n_active_days"),
            count(lit(1)).as("n_streaks"),
            max("len").as("longest"),
            max(struct(col("len"), col("start_day"))).getField("start_day")
              .as("longest_start_day"))
          .orderBy("user_id")
      },
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS day
        |  FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, grp, count(*) AS len, min(day) AS start_day
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, sum(len)::BIGINT AS n_active_days,
        |  count(*)::BIGINT AS n_streaks, max(len)::BIGINT AS longest,
        |  max(struct_pack(len := len, start_day := start_day)).start_day::BIGINT
        |    AS longest_start_day
        |FROM streaks GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Lag-1 and lag-24 autocorrelation of each type's hourly series —
    // the persistence + diurnal-seasonality diagnostic (is the metric
    // sticky hour-to-hour? does it repeat daily?). Hourly sums are
    // exact MILLI-unit longs (small enough that every co-moment long
    // stays below 2^63 and the final int64→double conversions are the
    // uniform IEEE-nearest both engines share); Pearson r over the
    // (x_k, x_{k+L}) pairs comes from one shared scalar formula. The
    // lead columns ride the SAME span-bounded per-type sort window;
    // pair volume is hours-in-span, never event count.
    QueryDef("q_events_autocorr",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy("h")
        val hb = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            floor(col("value") * 1000).cast("long").as("v"))
          .groupBy("event_type", "h").agg(sum("v").as("x"))
          .withColumn("x1", lead("x", 1).over(w))
          .withColumn("x24", lead("x", 24).over(w))
          .localCheckpoint(eager = false)
        def corrAt(lagCol: String, lagVal: Int) = hb
          .filter(col(lagCol).isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sa"), sum(lagCol).as("sb"),
            sum(col("x") * col(lagCol)).as("sab"),
            sum(col("x") * col("x")).as("saa"),
            sum(col(lagCol) * col(lagCol)).as("sbb"))
          .select(col("event_type"), lit(lagVal.toLong).as("lag"),
            col("n"),
            ((col("n").cast("double") * col("sab").cast("double") -
              col("sa").cast("double") * col("sb").cast("double")) /
              (sqrt(col("n").cast("double") * col("saa").cast("double") -
                col("sa").cast("double") * col("sa").cast("double")) *
               sqrt(col("n").cast("double") * col("sbb").cast("double") -
                col("sb").cast("double") * col("sb").cast("double"))))
              .as("r"))
        corrAt("x1", 1).unionAll(corrAt("x24", 24))
          .orderBy("event_type", "lag")
      },
      """WITH hb AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(floor(value * 1000)::BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |ld AS (
        |  SELECT event_type, x,
        |    lead(x, 1) OVER w AS x1, lead(x, 24) OVER w AS x24
        |  FROM hb WINDOW w AS (PARTITION BY event_type ORDER BY h)),
        |c1 AS (
        |  SELECT event_type, 1::BIGINT AS lag, count(*)::BIGINT AS n,
        |    sum(x)::BIGINT AS sa, sum(x1)::BIGINT AS sb,
        |    sum(x * x1)::BIGINT AS sab, sum(x * x)::BIGINT AS saa,
        |    sum(x1 * x1)::BIGINT AS sbb
        |  FROM ld WHERE x1 IS NOT NULL GROUP BY 1),
        |c24 AS (
        |  SELECT event_type, 24::BIGINT AS lag, count(*)::BIGINT AS n,
        |    sum(x)::BIGINT AS sa, sum(x24)::BIGINT AS sb,
        |    sum(x * x24)::BIGINT AS sab, sum(x * x)::BIGINT AS saa,
        |    sum(x24 * x24)::BIGINT AS sbb
        |  FROM ld WHERE x24 IS NOT NULL GROUP BY 1),
        |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c24)
        |SELECT event_type, lag, n,
        |  (n::DOUBLE * sab::DOUBLE - sa::DOUBLE * sb::DOUBLE) /
        |    (sqrt(n::DOUBLE * saa::DOUBLE - sa::DOUBLE * sa::DOUBLE) *
        |     sqrt(n::DOUBLE * sbb::DOUBLE - sb::DOUBLE * sb::DOUBLE)) AS r
        |FROM u ORDER BY event_type, lag""".stripMargin),

    // Rolling 24-hour OLS slope per type — the windowed version of
    // q_stats_ols' closed form and the live "is this metric trending"
    // primitive an ops dashboard polls. Co-moments are exact MILLI-unit
    // long sums over a 24-row frame (Σkx ≤ hours·span·values ≪ 2⁶³) on
    // ONE span-bounded per-type sort; slope = (nΣkx − ΣkΣx) /
    // (nΣk² − (Σk)²) evaluated in identical IEEE order. Short frames
    // at the series head use their actual n, so no warm-up rows are
    // dropped or special-cased.
    QueryDef("q_window_regression",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wk = Window.partitionBy("event_type").orderBy("h")
        val w24 = Window.partitionBy("event_type").orderBy("k")
          .rowsBetween(-23, 0)
        Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            floor(col("value") * 1000).cast("long").as("v"))
          .groupBy("event_type", "h").agg(sum("v").as("x"))
          .withColumn("k", row_number().over(wk).cast("long"))
          .select(col("event_type"), col("h"), col("k"),
            count(lit(1)).over(w24).as("n"),
            sum(col("k")).over(w24).as("sk"),
            sum(col("x")).over(w24).as("sx"),
            sum(col("k") * col("k")).over(w24).as("skk"),
            sum(col("k") * col("x")).over(w24).as("skx"))
          .filter(col("n") >= 2)
          .select(col("event_type"), col("h"), col("n"),
            ((col("n").cast("double") * col("skx").cast("double") -
              col("sk").cast("double") * col("sx").cast("double")) /
              (col("n").cast("double") * col("skk").cast("double") -
                col("sk").cast("double") * col("sk").cast("double")))
              .as("slope_milli_per_hour"))
          .orderBy("event_type", "h")
      },
      """WITH hb AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(floor(value * 1000)::BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |kb AS (
        |  SELECT event_type, h, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h)::BIGINT AS k
        |  FROM hb),
        |w AS (
        |  SELECT event_type, h,
        |    count(*) OVER w24 AS n,
        |    sum(k) OVER w24 AS sk, sum(x) OVER w24 AS sx,
        |    sum(k * k) OVER w24 AS skk, sum(k * x) OVER w24 AS skx
        |  FROM kb
        |  WINDOW w24 AS (PARTITION BY event_type ORDER BY k
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_type, h, n::BIGINT AS n,
        |  (n::DOUBLE * skx::DOUBLE - sk::DOUBLE * sx::DOUBLE) /
        |    (n::DOUBLE * skk::DOUBLE - sk::DOUBLE * sk::DOUBLE)
        |    AS slope_milli_per_hour
        |FROM w WHERE n >= 2 ORDER BY event_type, h""".stripMargin),
  )
}
