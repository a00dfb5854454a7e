package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 18: voice-activity segments over the audio frame
  * energy (gaps-and-islands on the q_multimodal_audio front end — the
  * step that turns per-frame RMS into the utterance spans an ASR
  * pipeline actually transcribes) and per-user maximum drawdown (the
  * peak-to-trough readout over a cumulative series).
  *
  * Scale shapes: VAD's framing is the established partition-local
  * slice-fold (no per-sample explode); the island windows partition by
  * doc_id with ≤ len/64 frames per doc. Drawdown partitions by user_id
  * — every window in both queries is keyed, never global, and the
  * running sums use DECIMAL(18,6) casts so both engines accumulate
  * exactly (order-free), not in float.
  */
object Round11Ops18 {

  val defs: Seq[QueryDef] = Seq(

    // Voice-activity segments: frames (64-sample RMS, silence < 68.0 —
    // q_multimodal_audio's exact framing) → drop silence → group
    // CONSECUTIVE active frames per doc via the islands trick
    // (frame − row_number is constant within a run). One row per
    // segment with span, frame count, and total energy.
    QueryDef("q_multimodal_vad",
      (s, d) => {
        val codes = transform(split(col("text"), ""),
          c => (ascii(c) - 32).cast("long"))
        val base = Tables.documents(s, d).select(
          col("doc_id"), length(col("text")).cast("long").as("n"),
          inline(array(struct(codes.as("codes")))))
        val nFrames = ((col("n") + 63L) / lit(64L)).cast("long")
        val ns = least(lit(64L), col("n") - col("idx") * 64L)
        val frames = base
          .select(col("doc_id"), col("n"), col("codes"),
            explode(sequence(lit(0L), nFrames - 1L)).as("idx"))
          .select(col("doc_id"), col("idx").as("frame"),
            ns.as("n_samples"),
            aggregate(slice(col("codes"), (col("idx") * 64L + 1L).cast("int"),
              ns.cast("int")), lit(0L), (a, x) => a + x * x).as("ss"))
          .filter(sqrt(col("ss").cast("double") / col("n_samples").cast("double"))
            >= 68.0)
        frames
          .withColumn("island",
            col("frame") - row_number().over(
              Window.partitionBy("doc_id").orderBy("frame")))
          .groupBy("doc_id", "island")
          .agg(min("frame").cast("long").as("start_frame"),
            max("frame").cast("long").as("end_frame"),
            count(lit(1)).cast("long").as("n_frames"),
            sum("ss").cast("long").as("ss_total"))
          .drop("island")
          .orderBy("doc_id", "start_frame")
      },
      """WITH c AS (SELECT doc_id, length(text) AS n, text FROM documents),
        |f AS (SELECT doc_id, n, text, unnest(range(0, (n + 63) // 64)) AS idx
        |      FROM c),
        |fr AS (SELECT doc_id, idx AS frame,
        |        least(64, n - idx * 64)::BIGINT AS n_samples,
        |        list_reduce(list_prepend(0::BIGINT,
        |          list_transform(range(idx*64 + 1, idx*64 + least(64, n - idx*64) + 1),
        |            i -> ((ascii(substring(text, i, 1)) - 32)::BIGINT
        |                  * (ascii(substring(text, i, 1)) - 32)::BIGINT))),
        |          (a, b) -> a + b) AS ss
        |      FROM f),
        |active AS (
        |  SELECT doc_id, frame, ss FROM fr
        |  WHERE sqrt(ss::DOUBLE / n_samples::DOUBLE) >= 68.0),
        |islands AS (
        |  SELECT doc_id, frame, ss,
        |    frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame)
        |      AS island
        |  FROM active)
        |SELECT doc_id, min(frame)::BIGINT AS start_frame,
        |  max(frame)::BIGINT AS end_frame, count(*)::BIGINT AS n_frames,
        |  sum(ss)::BIGINT AS ss_total
        |FROM islands GROUP BY doc_id, island
        |ORDER BY doc_id, start_frame""".stripMargin),

    // Maximum drawdown per user over the cumulative event value: the
    // running peak minus the running sum, maximized — "how far under
    // water did this account get?". Cumulative sums run in
    // DECIMAL(18,6) (exact, order-free) over the per-user
    // (ms-timestamp, event_id) order; output keeps micro fixed-point
    // BIGINTs so the hash is integer-exact.
    QueryDef("q_window_drawdown",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("tm"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
            col("value").cast("decimal(18,6)").as("v"))
          .withColumn("cum", sum("v").over(w))
          .withColumn("peak", max(col("cum")).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n_events"),
            (max((col("peak") - col("cum")).cast("decimal(28,6)"))
              * lit(1000000L)).cast("long").as("maxdd_micro"),
            (max(col("peak").cast("decimal(28,6)")) * lit(1000000L))
              .cast("long").as("peak_micro"))
          .orderBy("user_id")
      },
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    epoch_ms(date_trunc('millisecond', ts)) AS tm,
        |    value::DECIMAL(18,6) AS v
        |  FROM events),
        |cums AS (
        |  SELECT user_id, event_id, tm,
        |    sum(v) OVER (PARTITION BY user_id ORDER BY tm, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM ev),
        |peaks AS (
        |  SELECT user_id, cum,
        |    max(cum) OVER (PARTITION BY user_id ORDER BY tm, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM cums)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  (max((peak - cum)::DECIMAL(28,6)) * 1000000)::BIGINT AS maxdd_micro,
        |  (max(peak::DECIMAL(28,6)) * 1000000)::BIGINT AS peak_micro
        |FROM peaks GROUP BY user_id
        |ORDER BY user_id""".stripMargin),
  )
}
