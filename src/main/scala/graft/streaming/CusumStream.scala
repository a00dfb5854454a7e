package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming drift detection — the `transformWithState` twin of the
  * batch q_events_cusum query (Round14Ops3): the tabular CUSUM
  *   p_d = Σ_{d' ≤ d} (x_{d'}·n − t)        (integer drift units)
  *   s_d = p_d − min(0, min_{d' ≤ d} p_{d'})
  * over daily event counts, with the reference rate (t, n) supplied as
  * PARAMETERS — exactly how production CUSUM monitors run (the target
  * mean μ0 = t/n is calibrated offline; the batch query derives it
  * from the full corpus, so the spec feeds the batch-derived totals to
  * the stream and the two must agree bit-for-bit).
  *
  * State per series is O(1) regardless of stream length: the OPEN
  * day's (day, count) plus the closed-prefix (p, min p) pair. A day
  * closes — and its row emits (Append mode; closed rows are final) —
  * when a later day's first event arrives, so a day may arrive SPLIT
  * across any number of micro-batches. Ordering contract (the
  * CepFunnelProcessor trade): per-series event-time days must be
  * non-decreasing ACROSS micro-batches; a violation throws rather
  * than silently rewinding an already-closed day. StreamingSpec
  * proves stream == batch across three micro-batch boundaries on the
  * real events table.
  *
  * Scale shape: the stream shuffles one (series, day) pair per event
  * to its series key (a real deployment keys by metric series id —
  * the constant-0 key here mirrors the batch query's single global
  * series); state store holds 4 longs per series.
  */
object CusumStream {

  /** (open day, open count, closed-prefix p, closed-prefix min p). */
  case class CusumState(curDay: Long, curX: Long, pUnits: Long,
      minP: Long, hasOpen: Boolean)

  /** One CLOSED day — the batch query's row for that day. */
  case class CusumRow(day: Long, x: Long, p_units: Long, s_units: Long,
      cusum: Double, alarm: Boolean)

  class CusumProcessor(tUnits: Long, nDays: Long)
      extends StatefulProcessor[Long, (Long, Long), CusumRow] {
    @transient private var state: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    private def close(st: CusumState): (CusumState, CusumRow) = {
      val p = st.pUnits + st.curX * nDays - tUnits
      val minP = math.min(st.minP, p)
      val s = p - math.min(0L, minP)
      (st.copy(pUnits = p, minP = minP),
        CusumRow(st.curDay, st.curX, p, s,
          s.toDouble / nDays.toDouble, s > 3 * tUnits))
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[CusumRow] = {
      var st = if (state.exists()) state.get()
        else CusumState(0L, 0L, 0L, 0L, hasOpen = false)
      val counts = rows.toSeq.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val out = Seq.newBuilder[CusumRow]
      counts.foreach { case (day, n) =>
        if (!st.hasOpen)
          st = CusumState(day, n, st.pUnits, st.minP, hasOpen = true)
        else if (day == st.curDay)
          st = st.copy(curX = st.curX + n)
        else if (day > st.curDay) {
          val (closed, row) = close(st)
          out += row
          st = CusumState(day, n, closed.pUnits, closed.minP, hasOpen = true)
        } else
          // a closed day cannot be rewound — fail loudly, like the
          // batch query would simply have counted it
          throw new IllegalStateException(
            s"CUSUM day order violated: day $day after ${st.curDay} closed")
      }
      state.update(st)
      out.result().iterator
    }
  }

  /** The stream: one CUSUM series over all events (series id 0 — key by
    * a metric/series column in a multi-series deployment). Emits each
    * day's row once the next day begins. */
  def streamingCusum(events: DataFrame, tUnits: Long, nDays: Long)
      : Dataset[CusumRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(lit(0L).as("series"),
        floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new CusumProcessor(tUnits, nDays),
        TimeMode.None(), OutputMode.Append())
  }
}
