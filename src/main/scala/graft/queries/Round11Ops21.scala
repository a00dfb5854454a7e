package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 21: point-in-time feature extraction (the
  * feature-store op that assembles leakage-free training rows: for
  * each label event, aggregates over a trailing window that STOPS one
  * row before the event) and class-balanced downsampling (equalize
  * class counts to the minority class with a deterministic hash
  * order).
  *
  * Scale shapes: PIT features are per-user RANGE-frame windows
  * (bounded trailing time, partitioned by user — no global window);
  * balancing is one per-label partitioned rank plus a broadcast
  * |labels|-row minimum — both fully parallel at any corpus size.
  */
object Round11Ops21 {

  val defs: Seq[QueryDef] = Seq(

    // For every purchase event: clicks, views, errors and value sum in
    // the PRECEDING 24 hours (RANGE frame ending 1 ms before the
    // event — the point-in-time discipline that keeps the label row
    // itself and same-instant rows out of its own features; a VALUE
    // frame also makes ms-tie handling engine-independent). Value sums
    // in micro fixed-point BIGINT.
    QueryDef("q_events_pit_features",
      (s, d) => {
        val dayMs = 86400000L
        def trail(c: org.apache.spark.sql.Column) =
          sum(c).over(Window.partitionBy("user_id").orderBy("tm")
            .rangeBetween(-dayMs, -1))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
            floor(col("value") * lit(1e6)).cast("long").as("v_micro"))
        ev
          .withColumn("f_clicks",
            coalesce(trail(when(col("event_type") === "click", 1L)
              .otherwise(0L)), lit(0L)).cast("long"))
          .withColumn("f_views",
            coalesce(trail(when(col("event_type") === "view", 1L)
              .otherwise(0L)), lit(0L)).cast("long"))
          .withColumn("f_errors",
            coalesce(trail(when(col("event_type") === "error", 1L)
              .otherwise(0L)), lit(0L)).cast("long"))
          .withColumn("f_value_micro",
            coalesce(trail(col("v_micro")), lit(0L)).cast("long"))
          .filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "tm",
            "f_clicks", "f_views", "f_errors", "f_value_micro")
          .orderBy("user_id", "tm", "event_id")
      },
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ms(date_trunc('millisecond', ts)) AS tm,
        |    floor(value * 1e6)::BIGINT AS v_micro
        |  FROM events),
        |feats AS (
        |  SELECT user_id, event_id, event_type, tm,
        |    coalesce(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER w, 0)::BIGINT AS f_clicks,
        |    coalesce(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER w, 0)::BIGINT AS f_views,
        |    coalesce(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER w, 0)::BIGINT AS f_errors,
        |    coalesce(sum(v_micro) OVER w, 0)::BIGINT AS f_value_micro
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tm
        |    RANGE BETWEEN 86400000 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, tm,
        |  f_clicks, f_views, f_errors, f_value_micro
        |FROM feats WHERE event_type = 'purchase'
        |ORDER BY user_id, tm, event_id""".stripMargin),

    // Class-balanced downsample of the embedding corpus: every label
    // keeps exactly min-class-count vectors, chosen by the
    // deterministic md5 order (so the kept set is stable across runs
    // and engines). Output: per label, kept count and the fixed-point
    // sum of kept first coordinates (a cheap content digest proving
    // WHICH rows were kept, not just how many).
    QueryDef("q_sample_balanced",
      (s, d) => {
        val ranked = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            element_at(col("embedding"), 1).cast("double").as("x0"),
            md5(col("vec_id").cast("string").cast("binary")).as("h"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("label").orderBy(col("h"), col("vec_id"))))
        val minCnt = ranked.groupBy("label")
          .agg(count(lit(1)).as("cnt"))
          .agg(min("cnt").cast("long").as("k"))
        ranked.crossJoin(broadcast(minCnt))
          .filter(col("rn") <= col("k"))
          .groupBy("label")
          .agg(count(lit(1)).cast("long").as("n_kept"),
            sum(floor(col("x0") * lit(1e8)).cast("long")).cast("long")
              .as("x0_sum_fx"))
          .orderBy("label")
      },
      """WITH ranked AS (
        |  SELECT vec_id, label::BIGINT AS label,
        |    embedding[1]::DOUBLE AS x0,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY md5(vec_id::VARCHAR), vec_id) AS rn
        |  FROM embeddings),
        |k AS (SELECT min(cnt)::BIGINT AS k FROM (
        |        SELECT label, count(*) AS cnt FROM ranked GROUP BY 1)),
        |kept AS (SELECT * FROM ranked, k WHERE rn <= k)
        |SELECT label, count(*)::BIGINT AS n_kept,
        |  sum(floor(x0 * 1e8)::BIGINT)::BIGINT AS x0_sum_fx
        |FROM kept GROUP BY label
        |ORDER BY label""".stripMargin),
  )
}
