package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sharded

/** Round-11 batch 16: Holt's linear-trend smoothing over the per-type
  * daily event series (the classic level+trend forecaster — one step
  * past EWMA, one short of Holt-Winters), and an exact equi-depth
  * histogram over the fact table (the optimizer statistic: bucket
  * boundaries at exact corpus deciles, not equal-width bins).
  *
  * Scale shapes: Holt reduces the stream to |types|×|days| buckets with
  * one combinable groupBy, then folds each bounded series SORTED by day
  * with a struct accumulator — the recursion is inherently sequential
  * in TIME, so the day axis is the right place for it, and every float
  * step is the identical expression on both engines. Equi-depth ranks
  * the fact table through Sharded.globalRowNumber (price-range shards,
  * partitioned within-shard windows) — never a global one-task sort.
  */
object Round11Ops16 {

  val defs: Seq[QueryDef] = Seq(

    // Holt's linear method (α=0.5, β=0.3) on daily event counts per
    // type: l_t = αy_t + (1−α)(l_{t−1}+b_{t−1}),
    // b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, seeded l_1=y_1, b_1=0.
    // `forecast_next` = l_T + b_T (the h=1 extrapolation). The fold
    // duplicates the l_t expression inside b_t VERBATIM on both engines
    // so the float sequences are bit-identical.
    QueryDef("q_events_holt",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).cast("double").as("y"))
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("y")))).as("ser"))
          .select(col("event_type"), size(col("ser")).cast("long").as("n_days"),
            aggregate(col("ser"),
              struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0L).as("i")),
              (acc, x) => {
                val y = x.getField("y")
                val l = acc.getField("l")
                val b = acc.getField("b")
                val i = acc.getField("i")
                val newl = lit(0.5) * y + lit(0.5) * (l + b)
                val newb = lit(0.3) * ((lit(0.5) * y + lit(0.5) * (l + b)) - l) +
                  lit(0.7) * b
                when(i === 0L,
                  struct(y.as("l"), lit(0.0).as("b"), lit(1L).as("i")))
                  .otherwise(struct(newl.as("l"), newb.as("b"), (i + 1L).as("i")))
              }).as("st"))
          .select(col("event_type"), col("n_days"),
            col("st.l").as("level"), col("st.b").as("trend"),
            (col("st.l") + col("st.b")).as("forecast_next"))
          .orderBy("event_type")
      },
      // NB: the oracle uses a recursive CTE, not list_reduce — DuckDB's
      // list_reduce evaluates struct_pack fields SEQUENTIALLY against a
      // mutating accumulator (acc.l read inside the b field sees the
      // just-written new l), so a two-field recursion cannot be
      // expressed in it faithfully. The recursive CTE reads both state
      // fields from the previous row — no mutation hazard.
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
        |    count(*)::DOUBLE AS y
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT event_type,
        |    list_sort(list(struct_pack(day := day, y := y))) AS ser
        |  FROM daily GROUP BY 1),
        |rec AS (
        |  SELECT event_type, ser, len(ser) AS n, 1 AS t,
        |    struct_extract(ser[1], 'y')::DOUBLE AS l, 0.0::DOUBLE AS b
        |  FROM ser
        |  UNION ALL
        |  SELECT event_type, ser, n, t + 1,
        |    0.5::DOUBLE * struct_extract(ser[t + 1], 'y')::DOUBLE
        |      + 0.5::DOUBLE * (l + b),
        |    0.3::DOUBLE * ((0.5::DOUBLE * struct_extract(ser[t + 1], 'y')::DOUBLE
        |        + 0.5::DOUBLE * (l + b)) - l) + 0.7::DOUBLE * b
        |  FROM rec WHERE t < n)
        |SELECT event_type, n::BIGINT AS n_days, l AS level, b AS trend,
        |  l + b AS forecast_next
        |FROM rec WHERE t = n ORDER BY event_type""".stripMargin),

    // Exact equi-depth histogram of l_extendedprice in 10 buckets:
    // bucket(row) = floor((rank−1)·10/N) over the exact global rank —
    // the rank comes from Sharded.globalRowNumber with floor(price/1e4)
    // shards (price is the leading key, so the shard is order-exact);
    // the oracle uses the plain SQL row_number with the SAME bucket
    // formula. Each bucket reports its row count and [lo, hi] bounds —
    // the statistic a cost-based optimizer stores per column.
    QueryDef("q_stats_equidepth",
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .select(col("l_extendedprice").as("price"), col("l_orderkey"),
            col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        val tot = base.agg(count(lit(1)).cast("long").as("n"))
        Sharded.globalRowNumber(base, floor(col("price") / lit(10000.0)).cast("long"),
            Seq(col("price"), col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey")), "rn")
          .crossJoin(broadcast(tot))
          .withColumn("bucket", floor((col("rn") - 1) * lit(10) / col("n")).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            min("price").as("lo"), max("price").as("hi"))
          .orderBy("bucket")
      },
      """WITH ranked AS (
        |  SELECT l_extendedprice AS price,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber, l_partkey, l_suppkey) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem)
        |SELECT floor((rn - 1) * 10 / n)::BIGINT AS bucket,
        |  count(*)::BIGINT AS n_rows, min(price) AS lo, max(price) AS hi
        |FROM ranked GROUP BY 1 ORDER BY bucket""".stripMargin),
  )
}
