package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 23: the Hampel filter (rolling median ± scaled MAD —
  * the robust outlier detector that, unlike z-scores, one spike cannot
  * mask) and the Wald–Wolfowitz runs test (is a sequence random, or
  * does it trend/cluster?).
  *
  * Scale shapes: Hampel is two stacked per-user ROWS-frame window
  * percentiles (partitioned, bounded frames — fully parallel); the
  * runs test reduces the stream to the |days|-bounded daily series
  * with one combinable count, then folds runs above an aggregate.
  */
object Round11Ops23 {

  val defs: Seq[QueryDef] = Seq(

    // Hampel outlier filter on each user's event-value series: rolling
    // median over ±3 rows, rolling MAD (median of |x − med| over the
    // same frame re-centered at each row's med), flag when
    // |x − med| > 3 · 1.4826 · MAD. Two window passes — the deviation
    // column must exist before its median — both partitioned by user.
    // Output: flagged rows only, with the evidence columns.
    QueryDef("q_window_hampel",
      (s, d) => {
        val wf = Window.partitionBy("user_id")
          .orderBy(col("tm"), col("event_id")).rowsBetween(-3, 3)
        val base = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
            col("value"))
          .withColumn("med", percentile(col("value"), lit(0.5)).over(wf))
          .withColumn("dev", abs(col("value") - col("med")))
        base
          .withColumn("mad", percentile(col("dev"), lit(0.5)).over(wf))
          .filter(col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
          .select(col("user_id"), col("event_id"), col("tm"), col("value"),
            col("med"), col("mad"))
          .orderBy("user_id", "tm", "event_id")
      },
      """WITH base AS (
        |  SELECT user_id, event_id,
        |    epoch_ms(date_trunc('millisecond', ts)) AS tm, value,
        |    quantile_cont(value, 0.5) OVER w AS med
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tm, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |devs AS (
        |  SELECT *, abs(value - med) AS dev FROM base),
        |mads AS (
        |  SELECT user_id, event_id, tm, value, med, dev,
        |    quantile_cont(dev, 0.5) OVER w AS mad
        |  FROM devs
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tm, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |SELECT user_id, event_id, tm, value, med, mad
        |FROM mads WHERE dev > 3.0 * 1.4826 * mad
        |ORDER BY user_id, tm, event_id""".stripMargin),

    // Wald–Wolfowitz runs test on the daily error-count series: code
    // each day above/below the series median (median-equal days drop,
    // the standard treatment), count sign runs R, and test against the
    // randomness expectation E[R] = 2·n1·n2/(n1+n2) + 1. All counts are
    // BIGINT; the z-score is one closed-form float expression over
    // them. The day series is |days|-bounded, so the lag window sits
    // above an aggregate (house-legal).
    QueryDef("q_stats_runs",
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "error")
          .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .groupBy("day").agg(count(lit(1)).cast("long").as("cnt"))
        val med = daily.agg(percentile(col("cnt").cast("double"), lit(0.5))
          .as("med"))
        val signed = daily.crossJoin(broadcast(med))
          .filter(col("cnt").cast("double") =!= col("med"))
          .withColumn("above", (col("cnt").cast("double") > col("med")).cast("int"))
        val w = Window.orderBy("day")
        signed
          .withColumn("newrun",
            when(lag(col("above"), 1).over(w).isNull ||
              lag(col("above"), 1).over(w) =!= col("above"), 1L).otherwise(0L))
          .agg(sum(col("above").cast("long")).cast("long").as("n_above"),
            sum(lit(1) - col("above")).cast("long").as("n_below"),
            sum("newrun").cast("long").as("runs"))
          .withColumn("expected_runs",
            expr("""2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
              / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)) + 1.0"""))
          .withColumn("z",
            expr("""(CAST(runs AS DOUBLE) - expected_runs)
              / sqrt((expected_runs - 1.0) * (expected_runs - 2.0)
                / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE) - 1.0))"""))
          .select("n_above", "n_below", "runs", "expected_runs", "z")
      },
      """WITH daily AS (
        |  SELECT floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
        |    count(*)::BIGINT AS cnt
        |  FROM events WHERE event_type = 'error' GROUP BY 1),
        |med AS (SELECT quantile_cont(cnt::DOUBLE, 0.5) AS med FROM daily),
        |signed AS (
        |  SELECT day, (cnt::DOUBLE > med)::INTEGER AS above
        |  FROM daily, med WHERE cnt::DOUBLE <> med),
        |runsflag AS (
        |  SELECT above,
        |    CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
        |      OR lag(above) OVER (ORDER BY day) <> above THEN 1 ELSE 0 END
        |      AS newrun
        |  FROM signed),
        |agg AS (
        |  SELECT sum(above)::BIGINT AS n_above,
        |    sum(1 - above)::BIGINT AS n_below,
        |    sum(newrun)::BIGINT AS runs
        |  FROM runsflag)
        |SELECT n_above, n_below, runs,
        |  2.0 * n_above::DOUBLE * n_below::DOUBLE
        |    / (n_above::DOUBLE + n_below::DOUBLE) + 1.0 AS expected_runs,
        |  (runs::DOUBLE - (2.0 * n_above::DOUBLE * n_below::DOUBLE
        |    / (n_above::DOUBLE + n_below::DOUBLE) + 1.0))
        |    / sqrt(((2.0 * n_above::DOUBLE * n_below::DOUBLE
        |        / (n_above::DOUBLE + n_below::DOUBLE) + 1.0) - 1.0)
        |      * ((2.0 * n_above::DOUBLE * n_below::DOUBLE
        |        / (n_above::DOUBLE + n_below::DOUBLE) + 1.0) - 2.0)
        |      / (n_above::DOUBLE + n_below::DOUBLE - 1.0)) AS z
        |FROM agg""".stripMargin),
  )
}
