package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations, written once and usable from BOTH
  * batch and Structured Streaming inputs — Spark compiles the identical
  * logical operators either way (`withWatermark` is a no-op in batch).
  *
  * Streaming path: `spark.readStream` → [[tumbling]]/[[sessions]] →
  * `writeStream` with `OutputMode.Append` (watermark bounds state and
  * drops late data). Batch path: same builders, oracle-checked via the
  * q_window_tumbling / q_window_session queries.
  *
  * Scale: state size is #open-windows × #keys; the watermark is what keeps
  * that bounded on an unbounded stream — always set it from the maximum
  * expected event lateness, never unbounded.
  */
object EventStreams {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** 1-hour tumbling windows per event_type: count + exact value sum. */
  def tumbling(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming twin of q_json_variant: VARIANT parse + typed extraction
    * under a watermarked tumbling window. parse_json/variant_get are
    * per-row scalar expressions, so they ride the streaming plan exactly
    * like any projection — the windowed rollup's state is
    * #open-windows × #types regardless of payload shape, and append-mode
    * results equal the batch aggregation on the same rows. This is the
    * raw-JSON-lake ingestion path: the stream lands typed columns
    * without declaring a schema up front. */
  def variantRollup(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_k"))

  /** Windowed distinct-user sketch: HLL per 1-hour window — the
    * streaming half of the q_agg_hll_union mergeable-sketch story. The
    * per-window state is ONE sketch (bounded at any user cardinality,
    * where an exact streaming countDistinct would hold the full value
    * set per open window); partial sketches merge across micro-batches
    * exactly like map-side partials in batch, so append-mode results
    * equal the batch aggregation bit-for-bit. */
  def windowedUserSketch(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"))
      .select(col("window.start").as("window_start"), col("approx_users"))

  /** Windowed Count-Min sketch cells (4 md5-seeded rows × 256 buckets,
    * the q_agg_countmin geometry) over event_type — the streaming half
    * of the mergeable-frequency-sketch story: cells are PLAIN COUNTS,
    * so partials merge across micro-batches exactly like map-side
    * combine in batch (append-mode == batch bit-for-bit), and
    * per-open-window state is ≤ 1024 integer cells at ANY event
    * volume — where an exact per-key count would hold the full key
    * set. Point estimates read MIN over the 4 row cells downstream. */
  def countMinCells(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(expr(
        """transform(sequence(0, 3), r -> named_struct(
          |  'r', CAST(r AS BIGINT),
          |  'b', CAST(conv(substring(md5(concat(CAST(r AS STRING), ':', event_type)), 1, 15), 16, 10) AS BIGINT) % 256))"""
          .stripMargin)).as("c"))
      .groupBy(window(col("ts"), "1 hour"), col("c.r").as("r"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("r"), col("b"),
        col("cnt"))

  /** Sliding (hopping) 1h/30min windows per event_type. */
  def sliding(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** OHLC windowed resample — the streaming twin of q_events_ohlc.
    * Open/close are `min_by`/`max_by` on the unique (ts, user_id)
    * composite — DECLARATIVE aggregates, so they merge across
    * micro-batches exactly like map-side partials (each partial keeps
    * its best (key, value) pair; merging keeps the better key), which
    * is what makes the append-mode result equal the batch aggregation
    * without any custom state. Values are exact floor-micro longs.
    *
    * In-bucket order is (millisecond-truncated ts, event_id) — the
    * EXACT composite q_events_ohlc ranks by. (ts, user_id) is not
    * unique (one user can emit two events at one timestamp) and at
    * equal timestamps user_id order can differ from event_id order,
    * so the earlier key could silently diverge from the batch twin. */
  def ohlc(events: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    val v = floor(col("value") * 1000000).cast("long")
    val ord = struct(date_trunc("millisecond", col("ts")), col("event_id"))
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(min_by(v, ord).as("open"), max(v).as("high"), min(v).as("low"),
        max_by(v, ord).as("close"), count(lit(1)).as("volume"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
  }

  /** Windowed top-1: the busiest event_type per 1-hour window — CHAINED
    * stateful aggregations (count per (window, type) → arg-max per
    * window), the window-on-window pattern Structured Streaming supports
    * for append mode since the multiple-stateful-operator work: the first
    * aggregation's window column carries event-time, so the second
    * aggregation closes (and emits exactly one winner) when the watermark
    * passes the window end. Ties break to the lexicographically smallest
    * type via the (count, reversed-type) composite — deterministic in
    * both batch and streaming. */
  def topTypePerHour(events: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    val counts = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    // max_by on a composite struct: higher count wins; equal counts pick
    // the SMALLEST event_type (struct comparison is lexicographic, so the
    // type string is compared descending via a reversed sort key — built
    // from unicode-complement is overkill here: use min_by on (negated
    // count, type) instead, which orders exactly (count desc, type asc)
    val winner = min_by(
      struct(col("event_type"), col("n_events")),
      struct((-col("n_events")).as("neg"), col("event_type")))
    counts
      .groupBy(col("window"))
      .agg(winner.as("top"))
      .select(col("window.start").as("window_start"),
        col("top.event_type").as("top_type"),
        col("top.n_events").as("top_n"))
  }

  /** Stream-stream interval join: each click paired with the same user's
    * errors landing within `horizon` AFTER it. Both sides are watermarked,
    * which is what lets Structured Streaming BOUND the join state: a
    * buffered click can be dropped once the error-side watermark passes
    * `c_ts + horizon`, so state is O(events in the horizon window), not
    * O(stream). In batch the same builder degrades to a plain range
    * join — StreamingSpec asserts both modes produce identical rows. */
  def clickErrorPairs(events: DataFrame, watermark: String = "30 minutes",
                      horizon: String = "15 minutes",
                      joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("value").as("e_value"))
      .withWatermark("e_ts", watermark)
    // leftOuter: a click with no error in its horizon emits null-matched —
    // but only once the error-side watermark has passed the horizon end,
    // i.e. once absence is PROVEN. Same state bound as the inner join.
    clicks.join(errors,
        col("c_user") === col("e_user") &&
          col("e_ts") >= col("c_ts") &&
          col("e_ts") <= col("c_ts") + expr(s"interval $horizon"),
        joinType)
      .select(col("c_user").as("user_id"), col("c_ts"), col("e_ts"),
        col("c_value"), col("e_value"))
  }

  /** Custom arbitrary-state operator (mapGroupsWithState): per-user running
    * event counts that survive across micro-batches. Update output mode in
    * streaming; in batch the state starts empty so it degrades to a plain
    * groupBy count — tested equivalent in StreamingSpec. */
  def runningUserCounts(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          (uid, n)
      }
  }

  /** Per-user running state carried by [[RunningTotalsProcessor]]. */
  case class UserTotals(n: Long, totalCents: Long)

  /** Spark 4's `transformWithState` arbitrary-state API (the successor to
    * `mapGroupsWithState`): per-user running event counts + exact cent
    * totals in a named `ValueState`, RocksDB-backed. Cents keep the
    * accumulation integer-exact regardless of per-batch iterator order. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long, Long)] {
    @transient private var totals:
        org.apache.spark.sql.streaming.ValueState[UserTotals] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(0L, 0L)
      var n = prev.n; var cents = prev.totalCents
      rows.foreach { case (_, c) => n += 1; cents += c }
      totals.update(UserTotals(n, cents))
      Iterator.single((key, n, cents))
    }
  }

  /** [[RunningTotalsProcessor]] wired to the events frame: emits
    * (user_id, n_events, total_cents) with state surviving micro-batches. */
  def runningUserTotals(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** The single buffered dimension row [[AsOfEnrichProcessor]] keeps per
    * key: latest update timestamp (ms) + its exact cent value. */
  case class AsOfUpd(tsMs: Long, cents: Long)

  /** Streaming as-of enrichment — the `transformWithState` twin of the
    * native batch [[graft.plans.AsOfJoinExec]] operator: facts are
    * enriched with the LATEST dimension update at-or-before their event
    * time. State is ONE buffered update row per key (the same O(1)-memory
    * argument as the batch merge: each update is visited once, only the
    * current best is retained) — so state size is O(keys), independent of
    * stream length, with no watermark needed to bound it.
    *
    * Ordering contract: within a micro-batch rows are sorted by
    * (event time, updates-before-facts at ties — as-of is `<=`, so a
    * same-timestamp update is visible to the fact). ACROSS micro-batches
    * per-key update order must be non-decreasing for strict as-of
    * semantics: an update arriving after a later-timestamped fact was
    * already emitted cannot retroactively re-enrich it (the standard
    * streaming-enrichment trade; late updates only affect later facts —
    * stale-but-monotone, never time-travel).
    */
  class AsOfEnrichProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Boolean, Long), (Long, Long, Option[Long], Option[Long])] {
    @transient private var latest:
        org.apache.spark.sql.streaming.ValueState[AsOfUpd] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      latest = getHandle.getValueState[AsOfUpd]("latest",
        org.apache.spark.sql.Encoders.product[AsOfUpd],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Boolean, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Option[Long], Option[Long])] = {
      // ts asc; at equal ts updates (is_upd=true) sort before facts
      val sorted = rows.toSeq.sortBy(r => (r._2, !r._3))
      var cur = if (latest.exists()) Option(latest.get()) else None
      val out = Seq.newBuilder[(Long, Long, Option[Long], Option[Long])]
      sorted.foreach { case (_, ts, isUpd, cents) =>
        if (isUpd) { if (cur.forall(_.tsMs <= ts)) cur = Some(AsOfUpd(ts, cents)) }
        else out += ((key, ts, cur.map(_.tsMs), cur.map(_.cents)))
      }
      cur.foreach(latest.update)
      out.result().iterator
    }
  }

  /** [[AsOfEnrichProcessor]] wired to the events frame: every "error"
    * fact gains the same user's latest preceding "click" (ms timestamps,
    * exact integer cents). Emits (user_id, err_ts_ms, click_ts_ms,
    * click_cents) with the click fields null when no click precedes. */
  def asOfEnrichLatestClick(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Option[Long], Option[Long])] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type").isin("click", "error"))
      .select(col("user_id").cast("long"),
        unix_millis(col("ts")),
        col("event_type") === "click",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Boolean, Long)]
      .groupByKey(_._1)
      .transformWithState(new AsOfEnrichProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Per-user SCD2 state carried by [[Scd2Processor]]: the open
    * interval's type and its version number. */
  case class Scd2St(lastType: String, version: Long)

  /** Streaming SCD Type-2 changelog — the CDC twin of the batch
    * q_events_scd2 query: emits one row per STATE CHANGE (user_id,
    * version, state, valid_from_ms) as events arrive, carrying the open
    * interval across micro-batches in a `ValueState`. A downstream
    * MERGE (the q_merge_upsert shape) closes the previous version's
    * `valid_to` with each emitted change — together they maintain the
    * dimension history table incrementally, which is exactly how
    * warehouse CDC pipelines run SCD2 at scale (the batch query is the
    * backfill; this is the steady state).
    *
    * State is ONE (type, version) pair per key — O(keys), independent of
    * stream length, no watermark needed. Ordering contract (same as
    * [[AsOfEnrichProcessor]]): rows sort by event time within a batch;
    * across batches per-key event time must be non-decreasing. */
  class Scd2Processor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, String), (Long, Long, String, Long)] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[Scd2St] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[Scd2St]("scd2",
        org.apache.spark.sql.Encoders.product[Scd2St],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, String, Long)] = {
      val sorted = rows.toSeq.sortBy(_._2)
      var cur = if (st.exists()) Option(st.get()) else None
      val out = Seq.newBuilder[(Long, Long, String, Long)]
      sorted.foreach { case (_, tsMs, tpe) =>
        if (!cur.exists(_.lastType == tpe)) {
          val v = cur.map(_.version).getOrElse(0L) + 1
          out += ((key, v, tpe, tsMs))
          cur = Some(Scd2St(tpe, v))
        }
      }
      cur.foreach(st.update)
      out.result().iterator
    }
  }

  /** [[Scd2Processor]] wired to the events frame: emits (user_id,
    * version, state, valid_from_ms) change rows in append mode. */
  def scd2Changes(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new Scd2Processor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** One user's open session being accumulated across micro-batches. */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, totalCents: Long)
  /** A closed session: [start, last + gap), event count, exact value sum. */
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           total_value: Double)

  /** Custom sessionizer over arbitrary keyed state
    * (`flatMapGroupsWithState` + event-time timeout): sessions close
    * either inline (a later event arrives ≥ gap after the last) or via
    * state timeout once the watermark passes `last + gap` — the mechanism
    * that bounds state on an unbounded stream. Equivalent to
    * [[sessions]]/`session_window` (proven in StreamingSpec); exists to
    * exercise the arbitrary-state API the built-in can't expose (custom
    * merge logic, exact integer-cent accumulation).
    */
  def sessionizeWithState(events: DataFrame, gapMs: Long = 600000L,
                          watermark: String = "30 minutes")
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def close(uid: Long, s: OpenSession): ClosedSession =
      ClosedSession(uid, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.lastMs + gapMs), s.n, s.totalCents / 100.0)

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = close(uid, state.get)
            state.remove()
            Iterator(out)
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { case (_, ts, v) =>
              val t = ts.getTime
              val cents = Math.round(v * 100)
              open match {
                case Some(s) if t - s.lastMs < gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t),
                    n = s.n + 1, totalCents = s.totalCents + cents))
                case Some(s) =>
                  closed += close(uid, s)
                  open = Some(OpenSession(t, t, 1, cents))
                case None =>
                  open = Some(OpenSession(t, t, 1, cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  case class RateState(tokens: Long, lastMs: Long)
  case class RateDecision(event_id: Long, user_id: Long,
      allowed: Boolean, tokens_after: Long)

  /** Streaming twin of q_events_ratelimit's batch secondary-sort scan:
    * per-user token bucket as `flatMapGroupsWithState`. State is TWO
    * longs per user — (tokens, last event ms) — regardless of stream
    * length; identical integer recurrence (cap 5e6 micro-tokens, cost
    * 1e6, refill 100/ms), so stream output equals the batch query on
    * the same data when per-user arrival is time-ordered across
    * micro-batches (within a batch the group sorts itself). */
  def rateLimit(events: DataFrame): org.apache.spark.sql.Dataset[RateDecision] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val CAP = 5000000L; val COST = 1000000L; val RATE = 100L
    events
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        expr("unix_millis(date_trunc('MILLISECOND', ts))").as("tms"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[RateState, RateDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[RateState]) =>
          var st = state.getOption.orNull
          val out = rows.toSeq.sortBy(r => (r._3, r._1)).map { case (eid, _, tms) =>
            val before =
              if (st == null) CAP
              else math.min(CAP, st.tokens + (tms - st.lastMs) * RATE)
            val allowed = before >= COST
            val after = if (allowed) before - COST else before
            st = RateState(after, tms)
            RateDecision(eid, uid, allowed, after)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Gap-based session windows per user: a session extends while the next
    * event arrives < gap after the previous one; end = last event + gap.
    * Timestamps truncated to ms in the projection for cross-engine parity
    * (the corpus carries sub-microsecond components). */
  def sessions(events: DataFrame, gap: String = "10 minutes",
               watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        date_trunc("MILLISECOND", col("session_window.start")).as("session_start"),
        date_trunc("MILLISECOND", col("session_window.end")).as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming exactly-once dedup: drop re-deliveries of the same
    * event_id arriving within the watermark horizon —
    * `dropDuplicatesWithinWatermark`, the at-least-once → exactly-once
    * repair step in front of any downstream aggregation. State is one
    * entry per event id seen inside the horizon, EVICTED as the
    * watermark passes (unlike plain dropDuplicates, whose state grows
    * with the stream forever — the difference between a pipeline that
    * runs for a day and one that runs for a year). */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user CEP automaton state carried by [[CepFunnelProcessor]]:
    * matcher state (0/1/2), completed funnel count, window anchor (ms),
    * and events seen — the same triple the batch q_events_cep packs
    * into its fold accumulator. */
  case class CepState(st: Int, cnt: Long, anchor: Long, nEvents: Long)

  /** Streaming CEP — the `transformWithState` twin of q_events_cep's
    * batch fold: the greedy non-overlapping view→click→purchase
    * automaton (48 h window, `Round11Ops2.CepWindowMs`) runs per user
    * with O(1) state per key, emitting the running funnel count after
    * every micro-batch touching the user.
    *
    * Ordering contract (the [[AsOfEnrichProcessor]] trade): rows are
    * sorted by (event time, event_id) WITHIN each micro-batch before
    * folding; ACROSS batches per-user event time must be non-decreasing
    * for exact batch equivalence — a late event cannot rewind an
    * automaton that already consumed a later one. StreamingSpec proves
    * stream == batch under time-ordered replay.
    */
  class CepFunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, Long), (Long, Long, Long)] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[CepState] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[CepState]("cep",
        org.apache.spark.sql.Encoders.product[CepState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      val prev = if (state.exists()) state.get() else CepState(0, 0L, 0L, 0L)
      var (st, cnt, anchor, n) = (prev.st, prev.cnt, prev.anchor, prev.nEvents)
      // (user, tm, event_id, ty) — sort the batch's slice by time
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, tm, _, ty) =>
        n += 1
        if (st > 0 && tm - anchor > graft.queries.Round11Ops2.CepWindowMs) {
          st = 0; anchor = 0L
        }
        (st, ty) match {
          case (0, 1L) => st = 1; anchor = tm
          case (1, 2L) => st = 2
          case (2, 3L) => st = 0; cnt += 1; anchor = 0L
          case _ =>
        }
      }
      state.update(CepState(st, cnt, anchor, n))
      Iterator.single((key, cnt, n))
    }
  }

  /** [[CepFunnelProcessor]] wired to the events frame: emits
    * (user_id, n_funnels, n_events) updates, state surviving
    * micro-batches. */
  def streamingCepFunnels(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tyCode = when(col("event_type") === "view", 1L)
      .when(col("event_type") === "click", 2L)
      .otherwise(3L)
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("long"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))),
        col("event_id").cast("long"), tyCode)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new CepFunnelProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Per-user trailing-window buffer for [[PitFeatureProcessor]]: three
    * parallel primitive seqs (ms time, type code, micro value) — the
    * events still inside the 24 h lookback. */
  case class PitBuf(tms: Seq[Long], codes: Seq[Int], vals: Seq[Long])

  /** Streaming point-in-time feature assembly — the stream twin of the
    * batch q_events_pit_features query: on every purchase, emit the
    * trailing-24 h (click count, view count, error count, value sum)
    * computed from a per-user buffer that the processor evicts as event
    * time advances, with the SAME frame semantics as the batch RANGE
    * window ([tm−86400000, tm−1] — same-ms rows excluded on both
    * sides, so ms ties cannot flip features between modes).
    *
    * State is bounded by each user's 24 h event volume (the value-frame
    * analog of a watermark bound), independent of stream length.
    * Ordering contract (as [[Scd2Processor]]): rows sort by
    * (event time, event_id) within a batch; per-key event time is
    * non-decreasing across batches. */
  class PitFeatureProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, Int, Long),
        (Long, Long, Long, Long, Long, Long, Long)] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[PitBuf] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[PitBuf]("pitbuf",
        org.apache.spark.sql.Encoders.product[PitBuf],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, Int, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long, Long, Long, Long, Long)] = {
      val dayMs = 86400000L
      // (event_id, tm, code, vMicro) sorted by (tm, event_id)
      val sorted = rows.map(r => (r._2, r._3, r._4, r._5)).toSeq
        .sortBy(e => (e._2, e._1))
      var buf = if (st.exists()) {
        val b = st.get()
        b.tms.indices.map(i => (b.tms(i), b.codes(i), b.vals(i))).toVector
      } else Vector.empty[(Long, Int, Long)]
      val out = Seq.newBuilder[(Long, Long, Long, Long, Long, Long, Long)]
      sorted.foreach { case (eid, tm, code, v) =>
        buf = buf.dropWhile(_._1 < tm - dayMs)
        if (code == 3) { // purchase: features over [tm-dayMs, tm-1]
          val frame = buf.filter(_._1 < tm)
          out += ((key, eid, tm,
            frame.count(_._2 == 0).toLong,
            frame.count(_._2 == 1).toLong,
            frame.count(_._2 == 2).toLong,
            frame.map(_._3).sum))
        }
        buf = buf :+ ((tm, code, v))
      }
      st.update(PitBuf(buf.map(_._1), buf.map(_._2), buf.map(_._3)))
      out.result().iterator
    }
  }

  /** [[PitFeatureProcessor]] wired to the events frame: emits
    * (user_id, event_id, tm, f_clicks, f_views, f_errors,
    * f_value_micro) rows for each purchase, matching the batch
    * q_events_pit_features output. */
  def pitFeatures(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tyCode = when(col("event_type") === "click", 0)
      .when(col("event_type") === "view", 1)
      .when(col("event_type") === "error", 2)
      .when(col("event_type") === "purchase", 3)
      .otherwise(4)
    events
      .select(col("user_id").cast("long"),
        col("event_id").cast("long"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))),
        tyCode,
        floor(col("value") * lit(1e6)).cast("long"))
      .as[(Long, Long, Long, Int, Long)]
      .groupByKey(_._1)
      .transformWithState(new PitFeatureProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }
}
