package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStreams

/** Event-time windowing over the `events` table — the SAME operator
  * builders Structured Streaming uses ([[graft.streaming.EventStreams]]),
  * oracle-checked in batch mode (SURVEY.md §2.B note: operators are
  * identical in batch and stream).
  *
  * Parity notes: events.ts has sub-microsecond precision that Spark
  * truncates to µs on read while DuckDB keeps ns — window boundaries are
  * hour-aligned (exact) and session bounds are ms-truncated on both sides.
  * The DuckDB session oracle is the classic gap-islands rewrite
  * (lag → break flag → running session id), with a `>= gap` break to match
  * Spark's half-open `[start, last + gap)` session semantics.
  */
object EventsQueries {

  /** The SCD2 history frame (user_id, version, state, valid_from,
    * valid_to, is_current) shared by q_events_scd2 and the point-in-time
    * join — see q_events_scd2's scaladoc for the determinism and
    * sentinel rationale. */
  private def scd2Frame(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
    val w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("MILLISECOND", col("ts")).as("tsm"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"), col("tsm").as("valid_from"))
      .select(col("user_id"),
        row_number().over(w2).cast("long").as("version"),
        col("state"), col("valid_from"),
        coalesce(lead("valid_from", 1).over(w2),
          lit("2200-01-01 00:00:00").cast("timestamp")).as("valid_to"))
      .withColumn("is_current",
        col("valid_to") === lit("2200-01-01 00:00:00").cast("timestamp"))
  }

  /** DuckDB CTE text for [[scd2Frame]] — defines `scd2(user_id, version,
    * state, valid_from, valid_to, is_current)`; interpolated into both
    * consuming oracles so the two stay one definition. */
  private val scd2Sql: String =
    """e AS (
           SELECT user_id, event_id, event_type,
             date_trunc('milliseconds', ts) AS tsm
           FROM events),
         c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY tsm, event_id) AS prev FROM e),
         chg AS (SELECT user_id, event_id, event_type AS state,
                   tsm AS valid_from
                 FROM c WHERE prev IS NULL OR prev <> event_type),
         scd2 AS (
           SELECT user_id, (row_number() OVER w)::BIGINT AS version, state,
             valid_from::TIMESTAMP AS valid_from,
             coalesce(lead(valid_from) OVER w,
               TIMESTAMP '2200-01-01 00:00:00')::TIMESTAMP AS valid_to,
             (lead(valid_from) OVER w) IS NULL AS is_current
           FROM chg WINDOW w AS (PARTITION BY user_id
             ORDER BY valid_from, event_id))"""

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_window_tumbling",
      (s, d) => EventStreams.tumbling(Tables.events(s, d))
        .orderBy("window_start", "event_type"),
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type,
           count(*) AS n_events,
           (SUM(CAST(value AS DECIMAL(18,2))))::DOUBLE AS total_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""),

    // Windowed top-1 (busiest event_type per hour) — the CHAINED
    // stateful-aggregation builder (count per (window, type) → arg-max
    // per window); StreamingSpec proves append-mode streaming equals this
    // batch result, and the oracle pins the deterministic tie-break
    // (count desc, type asc).
    QueryDef("q_window_toptype",
      (s, d) => EventStreams.topTypePerHour(Tables.events(s, d))
        .orderBy("window_start"),
      """WITH c AS (
           SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type,
             count(*) AS n_events
           FROM events GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY window_start
                 ORDER BY n_events DESC, event_type ASC) AS rn FROM c)
         SELECT window_start, event_type AS top_type, n_events AS top_n
         FROM r WHERE rn = 1 ORDER BY window_start"""),

    // Sliding (hopping) windows: 1h length, 30min hop — every event lands
    // in exactly two windows; the oracle enumerates both grid-aligned
    // starts per event (Spark aligns hops to the epoch, as does the
    // floor(epoch/hop) formula).
    QueryDef("q_window_sliding",
      (s, d) => EventStreams.sliding(Tables.events(s, d))
        .orderBy("window_start", "event_type"),
      """WITH g AS (
           SELECT event_type, value,
             to_timestamp(floor(epoch(ts) / 1800) * 1800)::TIMESTAMP AS grid
           FROM events),
         e AS (
           SELECT event_type, value,
             unnest([grid, grid - INTERVAL 30 MINUTE]) AS window_start
           FROM g)
         SELECT window_start, event_type, count(*) AS n_events,
           (SUM(CAST(value AS DECIMAL(18,2))))::DOUBLE AS total_value
         FROM e GROUP BY 1, 2 ORDER BY window_start, event_type"""),

    // Dynamic (per-event) session gaps: error events only extend their
    // session 5 minutes, others 10. Spark merges overlapping [ts, ts+gap)
    // intervals; the oracle is the classic merge-intervals rewrite
    // (break when ts >= running max of previous interval ends).
    QueryDef("q_window_session_dynamic",
      (s, d) => {
        val gap = when(col("event_type") === "error", lit("5 minutes"))
          .otherwise(lit("10 minutes"))
        Tables.events(s, d)
          .groupBy(session_window(col("ts"), gap), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            date_trunc("MILLISECOND", col("session_window.start")).as("session_start"),
            date_trunc("MILLISECOND", col("session_window.end")).as("session_end"),
            col("n_events"))
          .orderBy("user_id", "session_start")
      },
      """WITH e AS (
           SELECT user_id, ts,
             ts + CASE WHEN event_type = 'error' THEN INTERVAL 5 MINUTE
                       ELSE INTERVAL 10 MINUTE END AS iv_end
           FROM events),
         m AS (
           SELECT user_id, ts, iv_end,
             max(iv_end) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_end
           FROM e),
         b AS (
           SELECT user_id, ts, iv_end,
             CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end THEN 1 ELSE 0 END AS brk
           FROM m),
         sids AS (
           SELECT user_id, ts, iv_end,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM b)
         SELECT user_id,
           date_trunc('milliseconds', min(ts))::TIMESTAMP AS session_start,
           date_trunc('milliseconds', max(iv_end))::TIMESTAMP AS session_end,
           count(*) AS n_events
         FROM sids GROUP BY user_id, sid ORDER BY user_id, session_start"""),

    QueryDef("q_window_session",
      (s, d) => EventStreams.sessions(Tables.events(s, d))
        .orderBy("user_id", "session_start"),
      """WITH e AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM e)
         SELECT user_id,
           date_trunc('milliseconds', min(ts))::TIMESTAMP AS session_start,
           date_trunc('milliseconds', max(ts) + INTERVAL 10 MINUTE)::TIMESTAMP AS session_end,
           count(*) AS n_events,
           (SUM(CAST(value AS DECIMAL(18,2))))::DOUBLE AS total_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""),

    // Time-grid gap fill: per-user hourly grid from the user's first to
    // last event hour, forward-filling the last observed value — the
    // resample/LOCF step behind dashboard series and feature snapshots
    // over sparse event streams.
    //
    // Scale design: the hourly downsample is a groupBy max_by whose
    // partial aggregate collapses map-side (one candidate row per
    // (user, hour) leaves each mapper — a row_number window would
    // shuffle every event). The grid explode is partition-local off the
    // tiny span frame (one row per user) and bounded by span/granularity;
    // the LOCF window partitions by user so state per task is one value.
    // Determinism: the "last" event is max by (ms-truncated ts,
    // event_id) on BOTH engines (events.ts keeps ns in DuckDB but µs in
    // Spark — ms truncation + the unique-id tie-break removes the gap);
    // the filled value is COPIED, never arithmetic, so doubles match
    // bit-for-bit. The first grid hour is the min-event hour, so
    // value_ff is never null.
    QueryDef("q_events_gapfill",
      (s, d) => {
        val ev = Tables.events(s, d)
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(expr(
            "max_by(value, struct(date_trunc('MILLISECOND', ts), event_id))")
            .as("v_obs"))
        val span = ev.groupBy("user_id").agg(
          date_trunc("hour", min("ts")).as("h0"),
          date_trunc("hour", max("ts")).as("h1"))
        val grid = span.select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("value_ff",
            last("v_obs", ignoreNulls = true).over(
              Window.partitionBy("user_id").orderBy("h")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("user_id").cast("long").as("user_id"), col("h"),
            col("value_ff"), col("v_obs").isNotNull.as("observed"))
          .orderBy("user_id", "h")
      },
      """WITH ranked AS (
           SELECT user_id, date_trunc('hour', ts) AS h, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY date_trunc('millisecond', ts) DESC, event_id DESC) AS rn
           FROM events),
         hourly AS (SELECT user_id, h, value AS v_obs FROM ranked WHERE rn = 1),
         span AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
                         date_trunc('hour', max(ts)) AS h1
                  FROM events GROUP BY 1),
         grid AS (SELECT user_id,
                    unnest(generate_series(h0, h1, INTERVAL 1 HOUR))::TIMESTAMP AS h
                  FROM span)
         SELECT g.user_id::BIGINT AS user_id, g.h::TIMESTAMP AS h,
           last_value(hy.v_obs IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS UNBOUNDED PRECEDING) AS value_ff,
           (hy.v_obs IS NOT NULL) AS observed
         FROM grid g LEFT JOIN hourly hy
           ON g.user_id = hy.user_id AND g.h = hy.h
         ORDER BY user_id, h"""),

    // SCD Type-2 history build: collapse each user's event stream into
    // versioned [valid_from, valid_to) state intervals, keeping only rows
    // where the state (event_type) actually changed — the warehouse
    // pattern behind dimension history tables and point-in-time joins
    // (the batch twin of the CDC pipelines every feature store runs).
    //
    // Determinism: ordering is (ms-truncated ts, event_id) on both
    // engines — the unique id breaks any same-millisecond tie, so the
    // lag-chain, the change filter, and the version numbering are all
    // pinned. The open (current) interval carries the classic SCD2
    // high-date sentinel instead of NULL — warehouse-standard (BETWEEN
    // range probes need a closed interval), and the driver's compare
    // cannot equate null timestamps (NaT != NaT), so a NULL valid_to
    // would be unverifiable. 2200-01-01, not 9999-12-31: the driver's
    // pandas layer holds ns-epoch timestamps that overflow past 2262.
    // Scale shape: two windows over ONE user_id-keyed sort (the
    // change filter runs on the first, version/lead on the filtered
    // sliver — per-user state is one row); no joins, no corpus-wide
    // shuffle beyond the per-user repartition every SCD build needs.
    QueryDef("q_events_scd2",
      (s, d) => scd2Frame(s, d).orderBy("user_id", "version"),
      s"""WITH $scd2Sql
         SELECT * FROM scd2 ORDER BY user_id, version"""),

    // Point-in-time join — the feature-store lookup the SCD2 table
    // exists for: each purchase is joined to the state interval that was
    // valid AT its event time (`valid_from <= ts < valid_to`), so
    // training features reflect what was knowable then, never a later
    // state (the leakage the PIT join prevents). The half-open probe
    // matches the half-open intervals, so every purchase matches EXACTLY
    // one version (intervals tile each user's timeline from their first
    // event on, and a purchase IS an event, so it can never precede its
    // user's first interval).
    //
    // Scale shape: an equi-join on user_id carrying the interval
    // predicate as a residual filter — per-user interval counts are
    // small (bounded by state changes), so the residual scans a short
    // run per probe; the q_join_range bucketing pattern is the fallback
    // if a key ever accumulates unbounded versions. No window over the
    // probe side at all.
    QueryDef("q_join_pointintime",
      (s, d) => {
        val p = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            date_trunc("MILLISECOND", col("ts")).as("ptsm"), col("value"))
        p.join(scd2Frame(s, d), Seq("user_id"))
          .filter(col("ptsm") >= col("valid_from") &&
            col("ptsm") < col("valid_to"))
          .select(col("user_id"), col("purchase_id"), col("ptsm"),
            col("value"), col("version"), col("state"))
          .orderBy("user_id", "purchase_id")
      },
      s"""WITH $scd2Sql,
         p AS (SELECT user_id, event_id AS purchase_id,
                 date_trunc('milliseconds', ts)::TIMESTAMP AS ptsm, value
               FROM events WHERE event_type = 'purchase')
         SELECT p.user_id AS user_id, purchase_id, ptsm, value, version, state
         FROM p JOIN scd2 ON p.user_id = scd2.user_id
           AND ptsm >= valid_from AND ptsm < valid_to
         ORDER BY p.user_id, purchase_id"""),

    // Trailing-window rate anomaly: per (event_type, hour) counts scored
    // as a z-score against the previous 6 OBSERVED hours — the
    // monitoring primitive behind ingest-pipeline alerting (a collapsed
    // source or a bot flood both show up as |z| spikes long before
    // corpus-level stats move). Hours with fewer than 6 predecessors are
    // warm-up and dropped.
    //
    // Determinism: the trailing mean/variance come from EXACT integer
    // window sums (n, Σc, Σc² are BIGINTs) pushed through one shared
    // division/sqrt expression tree — every double op is IEEE-determined
    // on both engines, so z hash-matches bit-for-bit; zero-variance
    // windows yield null z (a constant baseline has no scale for
    // deviation) but a TOTAL is_anomaly: on a constant baseline any
    // deviation is anomalous (infinite z) and equality is not. A null
    // boolean would also be unverifiable — the driver compare reads
    // Spark's null as None but DuckDB's as NaN (the NaT problem again),
    // while null DOUBLES normalize to NaN on both sides and compare
    // fine, which is why z may stay nullable and is_anomaly must not.
    // Scale shape: one map-side-combined groupBy to hourly
    // granularity (the only corpus-scaled shuffle), then windows over
    // the HOURLY frame — tasks hold (event_type × hours) rows, corpus
    // size long gone.
    QueryDef("q_events_anomaly",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(-6, -1)
        val mean = col("s").cast("double") / lit(6.0)
        val variance = (col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") / lit(6.0)) / lit(5.0)
        val z = when(variance > 0.0,
          (col("n_events").cast("double") - mean) / sqrt(variance))
        Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n_events"))
          .withColumn("n_prev", count(lit(1)).over(w))
          .withColumn("s", sum("n_events").over(w))
          .withColumn("ss", sum(col("n_events") * col("n_events")).over(w))
          .filter(col("n_prev") === 6)
          .select(col("event_type"), col("h"), col("n_events"),
            mean.as("mean_prev"), z.as("z"),
            when(variance > 0.0, abs(z) > 2.0)
              .otherwise(col("n_events").cast("double") =!= mean)
              .as("is_anomaly"))
          .orderBy("event_type", "h")
      },
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS h,
             count(*) AS n_events
           FROM events GROUP BY 1, 2),
         fr AS (
           SELECT event_type, h, n_events,
             count(*) OVER w AS n_prev,
             sum(n_events) OVER w AS s,
             sum(n_events * n_events) OVER w AS ss
           FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)),
         sc AS (
           SELECT event_type, h, n_events,
             s::DOUBLE / 6.0 AS mean_prev,
             (ss::DOUBLE - s::DOUBLE * s::DOUBLE / 6.0) / 5.0 AS variance
           FROM fr WHERE n_prev = 6)
         SELECT event_type, h, n_events,
           mean_prev,
           CASE WHEN variance > 0.0
                THEN (n_events::DOUBLE - mean_prev) / sqrt(variance) END AS z,
           CASE WHEN variance > 0.0
                THEN abs((n_events::DOUBLE - mean_prev) / sqrt(variance)) > 2.0
                ELSE n_events::DOUBLE <> mean_prev
           END AS is_anomaly
         FROM sc ORDER BY event_type, h"""),

    // Last-touch attribution: each purchase is credited to the user's
    // most recent STRICTLY-PRECEDING click within a 7-day lookback — the
    // marketing-analytics join every event warehouse runs. Implemented
    // as a running last-click carry (one per-user window, frame
    // [unbounded, -1]) rather than a purchases⋈clicks as-of join: the
    // stream is scanned once, no second shuffle, and the per-user window
    // state is one row. Both carried fields (click ts + id) read the
    // same frame under the same (ms-truncated ts, event_id) order, so
    // they name the same click row by construction — no pairing drift.
    // The attribution flag is null-safe on both engines (CASE/coalesce
    // mirror); the nullable click_id survives the driver compare (NaN
    // pairs equate) where a nullable TIMESTAMP would not, so click_ts
    // stays internal.
    QueryDef("q_events_attribution",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val clickTs = when(col("event_type") === "click", col("tsm"))
        val clickId = when(col("event_type") === "click", col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            date_trunc("MILLISECOND", col("ts")).as("tsm"))
          .withColumn("click_ts", last(clickTs, ignoreNulls = true).over(w))
          .withColumn("click_id", last(clickId, ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("tsm").as("purchase_ts"), col("click_id"),
            coalesce(col("tsm") <=
              col("click_ts") + expr("interval 7 days"), lit(false))
              .as("attributed"))
          .orderBy("user_id", "purchase_id")
      },
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             date_trunc('milliseconds', ts) AS tsm
           FROM events),
         c AS (
           SELECT user_id, event_id, event_type, tsm,
             last_value(CASE WHEN event_type = 'click' THEN tsm END
               IGNORE NULLS) OVER w AS click_ts,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
               IGNORE NULLS) OVER w AS click_id
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id AS purchase_id,
           tsm::TIMESTAMP AS purchase_ts, click_id,
           coalesce(tsm <= click_ts + INTERVAL 7 DAY, false) AS attributed
         FROM c WHERE event_type = 'purchase'
         ORDER BY user_id, purchase_id"""),

    // Session path mining — the top user journeys: sessionize (same
    // 10-minute-gap islands as q_window_session), render each session's
    // ordered event-type sequence as a ">"-joined path, count sessions
    // per path, top 20. The product-analytics member the funnel/cohort/
    // attribution family was missing: funnels ask "how many reached step
    // N", paths ask "what sequences actually happen".
    //
    // Determinism: in-session order is array_sort over (ms-truncated ts,
    // event_id, type) structs — the unique id pins same-ms ties, and the
    // DuckDB list(... ORDER BY tsm, event_id) mirror is the same total
    // order; the top-20 tie-break is (count desc, path asc). Scale
    // shape: the lag-break flag and the running session-id sum share ONE
    // user-keyed sort (same partitioning + order); per-session lists are
    // session-length-bounded; path counting is a map-side-combined
    // groupBy on short strings; top-20 plans as TakeOrdered, never a
    // global sort.
    QueryDef("q_events_paths",
      (s, d) =>
        // the lag/brk/sid columns come from the family's shared staged
        // adjacency frame (EventAdjacency) — one user-keyed sort serves
        // paths/transitions/concurrency/entropy_rate
        EventAdjacency.frame(s, d)
          .groupBy("user_id", "sid")
          .agg(array_sort(collect_list(struct(col("tsm"), col("event_id"),
            col("event_type")))).as("evs"))
          .select(concat_ws(">",
            transform(col("evs"), e => e.getField("event_type"))).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path").asc)
          .limit(20),
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             date_trunc('milliseconds', ts) AS tsm
           FROM events),
         b AS (
           SELECT *, CASE WHEN lag(tsm) OVER w IS NULL
                            OR tsm >= lag(tsm) OVER w + INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
         s AS (
           SELECT *, sum(brk) OVER (PARTITION BY user_id
             ORDER BY tsm, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM b),
         p AS (
           SELECT user_id, sid,
             array_to_string(list(event_type ORDER BY tsm, event_id), '>') AS path
           FROM s GROUP BY 1, 2)
         SELECT path, count(*) AS n_sessions
         FROM p GROUP BY 1
         ORDER BY n_sessions DESC, path ASC LIMIT 20"""),

    // Within-session transition matrix (first-order Markov counts +
    // row-normalized probabilities) — the aggregate view of the same
    // journeys q_events_paths enumerates: which step follows which, and
    // with what probability. Feeds next-action prediction baselines and
    // journey anomaly detection.
    //
    // A transition is an ADJACENT pair inside one session, read off the
    // SAME single user-keyed sort as the sessionizer: a row whose break
    // flag is 0 continues its predecessor's session, so (lag(type),
    // type) on that row IS the transition — no second window, no
    // per-session regroup. Probabilities are exact counts divided once
    // in DOUBLE (per-from totals via one small window over the matrix
    // frame, which is |types|²-bounded, not corpus-scaled).
    QueryDef("q_events_transitions",
      (s, d) =>
        // prev_type/prev_tsm read from the shared staged adjacency frame
        EventAdjacency.frame(s, d)
          .filter(col("prev_tsm").isNotNull &&
            col("tsm") < col("prev_tsm") + expr("interval 10 minutes"))
          .groupBy(col("prev_type").as("from_type"),
            col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("prob", col("n").cast("double") /
            sum("n").over(Window.partitionBy("from_type")).cast("double"))
          .orderBy("from_type", "to_type"),
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             date_trunc('milliseconds', ts) AS tsm
           FROM events),
         l AS (
           SELECT *, lag(event_type) OVER w AS prev_type,
             lag(tsm) OVER w AS prev_tsm
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
         t AS (
           SELECT prev_type AS from_type, event_type AS to_type,
             count(*) AS n
           FROM l
           WHERE prev_tsm IS NOT NULL
             AND tsm < prev_tsm + INTERVAL 10 MINUTE
           GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           n::DOUBLE / (sum(n) OVER (PARTITION BY from_type))::DOUBLE AS prob
         FROM t ORDER BY from_type, to_type"""),
  )
}
