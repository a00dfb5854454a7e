package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 batch 3: the matched-blocks rank test the stats family was
  * missing (Friedman — q_stats_kruskal's repeated-measures sibling), a
  * CUSUM drift monitor expressed through the prefix-sum identity (the
  * recursive max(0, ·) control chart made relational), and native
  * cume_dist window coverage through both engines' builtins.
  *
  * All three reduce the fact table to a calendar- or dimension-bounded
  * frame before any window — the only fact-sized work is one
  * map-side-combined groupBy each.
  */
object Round14Ops3 {

  val defs: Seq[QueryDef] = Seq(

    // Friedman test (nominal, midranks, no tie correction) over daily
    // event-type activity: blocks = days, treatments = event types,
    // response = daily count. Kruskal-Wallis asks "do independent
    // samples differ"; Friedman asks "do treatments differ WITHIN
    // matched blocks" — the right test when every day sees every type
    // and day-level traffic swamps type-level differences. Missing
    // (day, type) cells are gap-filled with count 0 (every block must
    // rank all k treatments). Doubled midranks stay integral:
    // R2 = 2·(#smaller) + (#ties incl self) + 1 = 2·(rank−1) + t + 1;
    // with S_j = Σ_blocks R2_j (so the true rank sum is S_j/2):
    //   χ² = 12/(n·k·(k+1))·Σ(S_j/2)² − 3·n·(k+1)
    //      = (3·ΣS_j² − 3·n²·k·(k+1)²) / (n·k·(k+1))
    // — every term an exact BIGINT, one IEEE division at the end.
    //
    // Scale shape: one map-side-combined fact groupBy(day, type); the
    // gap-fill grid and every window live on the |days|×|types| frame
    // (calendar- and domain-bounded — ~1e4 × ~10 rows at any corpus
    // size); BIGINT bounds: S_j ≤ 2k·n ≈ 2e5, ΣS_j² ≤ k·4k²n² ≈ 4e11.
    QueryDef("q_stats_friedman",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("event_type"))
        val counts = ev.groupBy("day", "event_type")
          .agg(count(lit(1)).as("cnt"))
        val days = counts.select("day").distinct()
        val types = counts.select("event_type").distinct()
        val grid = days.crossJoin(broadcast(types))
          .join(counts, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
        val wb = Window.partitionBy("day").orderBy("cnt")
        val wt = Window.partitionBy("day", "cnt")
        val r2 = grid
          .withColumn("r2", (lit(2) * (rank().over(wb) - lit(1)) +
            count(lit(1)).over(wt) + lit(1)).cast("long"))
        val sums = r2.groupBy("event_type").agg(sum("r2").as("s_j"))
        val nk = r2.agg(
          countDistinct("day").as("n_blocks"),
          countDistinct("event_type").as("k"))
        val tot = sums.agg(sum(col("s_j") * col("s_j")).as("ss2"))
        sums.crossJoin(broadcast(nk)).crossJoin(broadcast(tot))
          .select(col("event_type"), col("n_blocks"), col("k"),
            col("s_j").as("rank_sum2"),
            (col("s_j").cast("double") /
              (lit(2) * col("n_blocks")).cast("double")).as("mean_rank"),
            ((lit(3) * col("ss2") - lit(3) * col("n_blocks") * col("n_blocks") *
                col("k") * (col("k") + 1) * (col("k") + 1)).cast("double") /
              (col("n_blocks") * col("k") * (col("k") + 1)).cast("double"))
              .as("chi2"))
          .orderBy("event_type")
      },
      """WITH counts AS (
        |  SELECT ts::DATE AS day, event_type, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.day, t.event_type, coalesce(c.cnt, 0) AS cnt
        |  FROM (SELECT DISTINCT day FROM counts) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
        |  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type),
        |r2 AS (
        |  SELECT day, event_type,
        |    (2 * (rank() OVER (PARTITION BY day ORDER BY cnt) - 1)
        |      + count(*) OVER (PARTITION BY day, cnt) + 1)::BIGINT AS r2
        |  FROM grid),
        |sums AS (SELECT event_type, sum(r2)::BIGINT AS s_j FROM r2 GROUP BY 1),
        |nk AS (SELECT count(DISTINCT day)::BIGINT AS n_blocks,
        |              count(DISTINCT event_type)::BIGINT AS k FROM r2),
        |tot AS (SELECT sum(s_j * s_j)::BIGINT AS ss2 FROM sums)
        |SELECT event_type, n_blocks, k, s_j AS rank_sum2,
        |  s_j::DOUBLE / (2 * n_blocks)::DOUBLE AS mean_rank,
        |  (3 * ss2 - 3 * n_blocks * n_blocks * k * (k + 1) * (k + 1))::DOUBLE
        |    / (n_blocks * k * (k + 1))::DOUBLE AS chi2
        |FROM sums, nk, tot ORDER BY event_type""".stripMargin),

    // CUSUM control chart over daily event volume — drift detection for
    // ingestion monitoring (is traffic creeping above its mean, not just
    // spiking — q_events_anomaly catches spikes, CUSUM catches creep).
    // The textbook chart is the recursion S_i = max(0, S_{i−1} + x_i − k)
    // — not a prefix sum. But it closes over one:
    //   S_i = P_i − min(0, min_{j≤i} P_j),   P_i = Σ_{d≤i}(x_d − k)
    // so one ordered prefix sum + one running min replace the recursion.
    // With k = the global daily mean T/n, everything stays integral by
    // cross-multiplying: P in units of (count·n): P_i = Σ(x_d·n − T).
    // Alarm when the cumulated excess tops 3 mean-days: s_units > 3·T·1
    // — an exact integer comparison.
    //
    // Scale shape: one map-side-combined fact groupBy(day); both windows
    // run over the calendar-bounded day frame (the q_stats_runs
    // allowlist shape); BIGINT bounds: |P| ≤ n·T ≈ 1e4·(corpus rows).
    QueryDef("q_events_cusum",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .groupBy("day").agg(count(lit(1)).as("x"))
        val tot = daily.agg(sum("x").as("t"), count(lit(1)).as("n"))
        val wo = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(tot))
          .withColumn("p_units", sum(col("x") * col("n") - col("t")).over(wo))
          .withColumn("s_units",
            col("p_units") - least(lit(0L), min("p_units").over(wo)))
          .select(col("day"), col("x"), col("p_units"), col("s_units"),
            (col("s_units").cast("double") / col("n").cast("double"))
              .as("cusum"),
            (col("s_units") > lit(3) * col("t")).as("alarm"))
          .orderBy("day")
      },
      """WITH daily AS (
        |  SELECT floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
        |         count(*)::BIGINT AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT sum(x)::BIGINT AS t, count(*)::BIGINT AS n FROM daily),
        |pre AS (
        |  SELECT day, x, t, n,
        |    sum(x * n - t) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_units
        |  FROM daily, tot),
        |cs AS (
        |  SELECT day, x, t, n, p_units,
        |    p_units - least(0, min(p_units) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_units
        |  FROM pre)
        |SELECT day, x, p_units::BIGINT AS p_units, s_units::BIGINT AS s_units,
        |  s_units::DOUBLE / n::DOUBLE AS cusum,
        |  s_units > 3 * t AS alarm
        |FROM cs ORDER BY day""".stripMargin),

    // cume_dist through both engines' native window builtins — the
    // "fraction of peers at or below me" readout (supplier revenue
    // percentile within nation). Distinct from q_window_percentrank:
    // percent_rank = (rank−1)/(n−1) jumps with ties' MIN rank,
    // cume_dist = (#≤)/n uses ties' MAX — a real semantic difference
    // both engines must agree on. Internally both compute one integer
    // ratio per row, so the doubles are bit-equal by construction.
    //
    // Scale shape: one map-side-combined fact groupBy(suppkey) →
    // supplier-sized frame; the window partitions by nation over the
    // AGGREGATED frame (the q_stats_gini shape); dimensions broadcast.
    QueryDef("q_window_cumedist",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy("l_suppkey")
          .agg(sum(floor(col("l_extendedprice") * lit(100) + lit(0.5))
            .cast("long")).as("rev_cents"))
        rev.join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("s_suppkey"), col("rev_cents"))
          .withColumn("cd", cume_dist().over(
            Window.partitionBy("n_name").orderBy("rev_cents")))
          .orderBy("n_name", "s_suppkey")
      },
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT n_name, s_suppkey, rev_cents,
        |  cume_dist() OVER (PARTITION BY n_name ORDER BY rev_cents) AS cd
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name, s_suppkey""".stripMargin))
}
