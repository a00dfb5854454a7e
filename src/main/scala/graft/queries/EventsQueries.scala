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
  )
}
