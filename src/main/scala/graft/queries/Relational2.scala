package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational batch: pivot, exact moment-based statistics, map
  * functions, interpolated percentiles. */
object Relational2 {

  val defs: Seq[QueryDef] = Seq(

    // groupBy().pivot() with explicit value list (no extra distinct-scan
    // job); oracle is the equivalent conditional aggregation.
    QueryDef("q_pivot",
      (s, d) => {
        val piv = Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        piv.select(col("o_orderpriority"),
          coalesce(col("F"), lit(0.0)).as("f_total"),
          coalesce(col("O"), lit(0.0)).as("o_total"),
          coalesce(col("P"), lit(0.0)).as("p_total"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority,
           COALESCE((SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END))::DOUBLE, 0.0) AS f_total,
           COALESCE((SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END))::DOUBLE, 0.0) AS o_total,
           COALESCE((SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END))::DOUBLE, 0.0) AS p_total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // Variance/stddev via exact decimal moments: Σx and Σx² are DECIMAL
    // (order-independent), then one identical double expression on both
    // sides — deterministic where naive float welford/sum-of-squares isn't.
    QueryDef("q_agg_stats",
      (s, d) => {
        val q = col("l_quantity").cast("decimal(18,2)")
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(q).cast("double").as("sx"),
            sum(q * q).cast("double").as("sxx"))
          .select(col("l_returnflag"), col("n"),
            (col("sx") / col("n")).as("mean_qty"),
            ((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")).as("var_pop"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
              .as("stddev_samp"))
          .orderBy("l_returnflag")
      },
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
             (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sx,
             (SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sxx
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n, sx / n AS mean_qty,
           (sxx - sx * sx / n) / n AS var_pop,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_samp
         FROM m ORDER BY l_returnflag"""),

    // Pearson correlation / covariance from exact decimal co-moments —
    // same determinism technique as q_agg_stats, extended to two columns.
    // Columns chosen small-valued (quantity ≤ 50, discount ≤ 0.1) so every
    // co-moment stays far below 2^53 in decimal units at any scale factor:
    // beyond that, decimal→double conversion itself rounds, and DuckDB's
    // int128-based conversion can differ from Java BigDecimal by 1 ulp
    // (observed with price² sums).
    QueryDef("q_agg_corr",
      (s, d) => {
        val x = col("l_quantity").cast("decimal(18,2)")
        val y = col("l_discount").cast("decimal(18,2)")
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"),
            sum(x * y).cast("double").as("sxy"))
          .select(col("l_returnflag"), col("n"),
            ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n")).as("covar_pop"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qty_disc"))
          .orderBy("l_returnflag")
      },
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
             (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sx,
             (SUM(CAST(l_discount AS DECIMAL(18,2))))::DOUBLE AS sy,
             (SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sxx,
             (SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))))::DOUBLE AS syy,
             (SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))))::DOUBLE AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           (sxy - sx * sy / n) / n AS covar_pop,
           (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS corr_qty_disc
         FROM m ORDER BY l_returnflag"""),

    // Correlated LATERAL join through the SQL frontend: per-customer
    // top order, decorrelated by Catalyst into a ranked join.
    QueryDef("q_join_lateral",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_lat")
        Tables.customer(s, d).createOrReplaceTempView("customer_lat")
        s.sql("""
          SELECT c_custkey, c_name, t.o_orderkey AS top_order, t.o_totalprice AS top_price
          FROM customer_lat,
          LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
                   WHERE o_custkey = c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t
          ORDER BY c_custkey""")
      },
      """SELECT c_custkey, c_name, t.o_orderkey AS top_order, t.o_totalprice AS top_price
         FROM customer,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t
         ORDER BY c_custkey"""),

    QueryDef("q_map_fns",
      (s, d) => {
        val m = map(lit("type"), col("event_type"),
          lit("k"), get_json_object(col("props"), "$.k"))
        Tables.events(s, d).select(
          col("event_id"),
          element_at(m, "type").as("m_type"),
          element_at(m, "k").as("m_k"),
          size(m).cast("long").as("m_size"),
          concat_ws(",", map_keys(m)).as("m_keys"))
          .orderBy("event_id")
      },
      """SELECT event_id,
           event_type AS m_type,
           json_extract_string(props, '$.k') AS m_k,
           2::BIGINT AS m_size,
           'type,k' AS m_keys
         FROM events ORDER BY event_id"""),

    // Higher-order map functions: transform_keys/values, map_filter,
    // map_zip_with — rendered to deterministic strings via sorted
    // map_entries (map iteration order is engine-specific).
    QueryDef("q_map_fns2",
      (s, d) => {
        val m = map(lit("a"), col("o_totalprice"), lit("b"), col("o_totalprice") * 2)
        val doubled = transform_values(m, (_, v) => (v.cast("decimal(18,2)") * 2).cast("double"))
        val upper = transform_keys(m, (k, _) => org.apache.spark.sql.functions.upper(k))
        val onlyA = map_filter(m, (k, _) => k === "a")
        val zipped = map_zip_with(m, doubled,
          (_, v1, v2) => (v2.cast("decimal(18,2)") - v1.cast("decimal(18,2)")).cast("double"))
        def render(mc: org.apache.spark.sql.Column) = concat_ws("|",
          transform(array_sort(map_entries(mc)),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast("decimal(18,2)").cast("string"))))
        // balanced (r17): four map renders × decimal-string casts per
        // row ran single-threaded in the one-row-group scan stage
        Tables.balanced(Tables.orders(s, d)
            .select("o_orderkey", "o_totalprice")).select(
          col("o_orderkey"),
          render(doubled).as("doubled_str"),
          render(upper).as("upper_str"),
          render(onlyA).as("only_a_str"),
          render(zipped).as("zipped_str"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey,
           'a=' || (CAST(o_totalprice AS DECIMAL(18,2)) * 2)::VARCHAR
             || '|b=' || (CAST(o_totalprice * 2 AS DECIMAL(18,2)) * 2)::VARCHAR AS doubled_str,
           'A=' || CAST(o_totalprice AS DECIMAL(18,2))::VARCHAR
             || '|B=' || CAST(o_totalprice * 2 AS DECIMAL(18,2))::VARCHAR AS upper_str,
           'a=' || CAST(o_totalprice AS DECIMAL(18,2))::VARCHAR AS only_a_str,
           'a=' || (CAST(o_totalprice AS DECIMAL(18,2)) * 2 - CAST(o_totalprice AS DECIMAL(18,2)))::VARCHAR
             || '|b=' || (CAST(o_totalprice * 2 AS DECIMAL(18,2)) * 2 - CAST(o_totalprice * 2 AS DECIMAL(18,2)))::VARCHAR AS zipped_str
         FROM orders ORDER BY o_orderkey"""),

    // DataFrameNaFunctions: fill / replace / drop over a column made
    // nullable with nullif — the missing-data API of a cleaning pipeline.
    QueryDef("q_na_fns",
      (s, d) => {
        val withNulls = Tables.orders(s, d).select(
          col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("status_n"),
          nullif((col("o_custkey") % 10).cast("long"), lit(0L)).as("prio_n"))
        withNulls.na.fill(Map("status_n" -> "MISSING", "prio_n" -> -1L))
          .na.replace("status_n", Map("F" -> "FINAL"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey,
           CASE COALESCE(nullif(o_orderstatus, 'P'), 'MISSING')
             WHEN 'F' THEN 'FINAL'
             ELSE COALESCE(nullif(o_orderstatus, 'P'), 'MISSING') END AS status_n,
           COALESCE(nullif((o_custkey % 10)::BIGINT, 0), -1) AS prio_n
         FROM orders ORDER BY o_orderkey"""),

    // Two-phase salted aggregation — the standard skew mitigation when a
    // handful of hot keys would overload single reducers: phase 1
    // aggregates (key, salt) across 16-way salt fanout, phase 2 merges
    // per key. DECIMAL sums make the result identical to the direct
    // single-phase aggregation, which is exactly what the oracle runs.
    QueryDef("q_agg_salted",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val salted = li
          .withColumn("_salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)))
          .groupBy(col("l_returnflag"), col("_salt"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("part_sum"),
            count(lit(1)).as("part_n"))
        salted.groupBy("l_returnflag")
          .agg(sum(col("part_sum")).cast("double").as("revenue"),
            sum(col("part_n")).as("n_rows"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag,
           (SUM(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS revenue,
           count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // As-of join composed from built-ins (SURVEY §2.B extension ladder
    // step (a): union + last_value-over-window beats a custom plan): for
    // each 'error' event, the most recent preceding 'click' of the same
    // user. One shuffle by user_id, sort within partition — the classic
    // scalable as-of shape. Timestamps ms-truncated for ns/µs parity;
    // ties broken by event_id identically on both sides.
    QueryDef("q_join_asof",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(col("user_id"),
            date_trunc("MILLISECOND", col("ts")).as("tsm"),
            col("event_id"), col("value"),
            (col("event_type") === "click").cast("int").as("is_click"),
            (col("event_type") === "error").cast("int").as("is_err"))
        val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        u.withColumn("click_id",
            last(when(col("is_click") === 1, col("event_id")), ignoreNulls = true).over(w))
          .withColumn("click_value",
            last(when(col("is_click") === 1, col("value")), ignoreNulls = true).over(w))
          .filter(col("is_err") === 1)
          .select(col("user_id"), col("event_id"), col("tsm").as("err_ts"),
            coalesce(col("click_id"), lit(-1L)).as("click_id"),
            coalesce(col("click_value"), lit(-1.0)).as("click_value"))
          .orderBy("event_id")
      },
      """WITH u AS (
           SELECT user_id, date_trunc('milliseconds', ts)::TIMESTAMP AS tsm, event_id, value,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
                  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
           FROM events WHERE event_type IN ('click', 'error')),
         w AS (
           SELECT *,
             last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY tsm, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
             last_value(CASE WHEN is_click = 1 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY tsm, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_value
           FROM u)
         SELECT user_id, event_id, tsm AS err_ts,
           COALESCE(click_id, -1) AS click_id,
           COALESCE(click_value, -1.0) AS click_value
         FROM w WHERE is_err = 1 ORDER BY event_id"""),

    // The same error→latest-click attachment through the NATIVE as-of
    // join operator (graft.plans.AsOfJoin → AsOfJoinExec: co-partitioned
    // single-pass merge; extension-ladder step (c)) instead of the
    // union+window emulation above. Clicks are deduped to one row per
    // (user, ms) so the backward match is unique, which lets DuckDB's own
    // ASOF LEFT JOIN serve as a fully independent oracle.
    QueryDef("q_join_asof_native",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"),
            date_trunc("MILLISECOND", col("ts")).as("err_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("c_user"),
            date_trunc("MILLISECOND", col("ts")).as("click_ts"))
          .agg(max("event_id").as("click_id"),
            max_by(col("value"), col("event_id")).as("click_value"))
        graft.ops.Joins.asofBackward(errors, clicks,
            Seq("user_id"), Seq("c_user"), "err_ts", "click_ts")
          .select(col("user_id"), col("event_id"), col("err_ts"),
            coalesce(col("click_ts"), lit("1970-01-01").cast("timestamp")).as("click_ts"),
            coalesce(col("click_id"), lit(-1L)).as("click_id"),
            coalesce(col("click_value"), lit(-1.0)).as("click_value"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT user_id, event_id,
                    date_trunc('milliseconds', ts)::TIMESTAMP AS err_ts
             FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id AS c_user,
                    date_trunc('milliseconds', ts)::TIMESTAMP AS click_ts,
                    max(event_id) AS click_id,
                    arg_max(value, event_id) AS click_value
             FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT e.user_id, e.event_id, e.err_ts,
           COALESCE(c.click_ts, TIMESTAMP '1970-01-01') AS click_ts,
           COALESCE(c.click_id, -1) AS click_id,
           COALESCE(c.click_value, -1.0) AS click_value
         FROM e ASOF LEFT JOIN c ON e.user_id = c.c_user AND c.click_ts <= e.err_ts
         ORDER BY e.event_id"""),

    // Forward direction of the native as-of operator: each error paired
    // with the user's FIRST click at/after it (follow-up-action analysis).
    QueryDef("q_join_asof_fwd",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"),
            date_trunc("MILLISECOND", col("ts")).as("err_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("c_user"),
            date_trunc("MILLISECOND", col("ts")).as("click_ts"))
          .agg(max("event_id").as("click_id"))
        graft.ops.Joins.asofForward(errors, clicks,
            Seq("user_id"), Seq("c_user"), "err_ts", "click_ts")
          .select(col("user_id"), col("event_id"), col("err_ts"),
            coalesce(col("click_ts"), lit("1970-01-01").cast("timestamp")).as("click_ts"),
            coalesce(col("click_id"), lit(-1L)).as("click_id"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT user_id, event_id,
                    date_trunc('milliseconds', ts)::TIMESTAMP AS err_ts
             FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id AS c_user,
                    date_trunc('milliseconds', ts)::TIMESTAMP AS click_ts,
                    max(event_id) AS click_id
             FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT e.user_id, e.event_id, e.err_ts,
           COALESCE(c.click_ts, TIMESTAMP '1970-01-01') AS click_ts,
           COALESCE(c.click_id, -1) AS click_id
         FROM e ASOF LEFT JOIN c ON e.user_id = c.c_user AND c.click_ts >= e.err_ts
         ORDER BY e.event_id"""),

    // HyperLogLog approximate distinct — sketch layouts differ across
    // engines, so the RAW estimate can't hash-match DuckDB. Instead the
    // query emits its own CALIBRATION: per group, the exact distinct
    // count (mirrored in SQL) plus a within-5%-of-exact boolean over
    // the sketch estimate (default rsd = 0.05 — the accuracy the
    // sketch contracts). The oracle states the exact side and pins the
    // booleans TRUE, so the driver gate now fails if the sketch ever
    // drifts outside its own error bar — strictly stronger than the
    // old rows-only check (quantitative twin: OpsSpec).
    QueryDef("q_agg_approx",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("ap"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_suppkey")).as("as_"),
          countDistinct(col("l_suppkey")).as("exact_supps"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          (abs(col("ap") - col("exact_parts")).cast("double") <=
            col("exact_parts") * 0.05).as("parts_within_5pct"),
          (abs(col("as_") - col("exact_supps")).cast("double") <=
            col("exact_supps") * 0.05).as("supps_within_5pct"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
           count(DISTINCT l_partkey)::BIGINT AS exact_parts,
           count(DISTINCT l_suppkey)::BIGINT AS exact_supps,
           true AS parts_within_5pct, true AS supps_within_5pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Exact interpolated percentiles (Spark `percentile` == DuckDB
    // `quantile_cont`, both (1-g)·a + g·b on the sorted values).
    QueryDef("q_agg_percentile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_extendedprice, 0.25)").as("p25_price"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Approximate-percentile sketch — the 100 TB twin of q_agg_percentile:
    // exact interpolated percentiles need every group's values sorted in
    // one place, a Greenwald-Khanna sketch aggregates in a single pass
    // with bounded memory and a mergeable partial state (rank error
    // ≤ n/accuracy). Sketches differ per engine (DuckDB approx_quantile
    // is t-digest), so the raw estimate can't hash-match — the query
    // emits its CALIBRATION instead: the exact interpolated percentiles
    // (SQL-mirrored) plus a boolean per target pinning the sketch value
    // INSIDE the exact ±5-percentile rank window (with accuracy=10000
    // the rank error is ≤ n/10000, far inside that bar). The oracle
    // computes the exact side and states the booleans TRUE — the gate
    // now catches a sketch drifting outside its rank contract
    // (value-level twin: OpsSpec's 1% pin).
    QueryDef("q_agg_percentile_approx",
      // ARRAY-form percentile/approx_percentile: ONE sketch and ONE
      // exact state per column instead of one per target — the scalar
      // form ran 12 independent percentile aggregations (each builds
      // its own per-group value buffer) and cost 4.3 s at sf0.1; the
      // array form computes identical values from 4 states (~3×
      // cheaper), and the oracle is unchanged.
      // balanced (r17): the exact-percentile buffers + GK sketch
      // inserts are the partial-agg cost and ran single-threaded in the
      // one-row-group scan stage; partials are mergeable, so the
      // rebalance parallelizes the insert pass 32-way (no-op on real
      // multi-file input)
      (s, d) => Tables.balanced(Tables.lineitem(s, d)
          .select("l_returnflag", "l_quantity", "l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, array(0.5, 0.9), 10000)").as("aq"),
          expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("ap"),
          expr("percentile(l_quantity, array(0.45, 0.5, 0.55, 0.85, 0.9, 0.95))")
            .as("pq"),
          expr("percentile(l_extendedprice, array(0.20, 0.25, 0.30))").as("pp"))
        .select(col("l_returnflag"),
          col("pq")(1).as("median_qty"), col("pq")(4).as("p90_qty"),
          col("pp")(1).as("p25_price"),
          (col("aq")(0) >= col("pq")(0) && col("aq")(0) <= col("pq")(2))
            .as("p50_in_band"),
          (col("aq")(1) >= col("pq")(3) && col("aq")(1) <= col("pq")(5))
            .as("p90_in_band"),
          (col("ap") >= col("pp")(0) && col("ap") <= col("pp")(2))
            .as("p25_in_band"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           true AS p50_in_band, true AS p90_in_band, true AS p25_in_band
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Mode (most-frequent-value) aggregate — the missing member of the
    // central-tendency family (mean/median/percentiles above): per
    // event type, the most frequent integer value bucket. Built as
    // count-per-(group, bucket) + one argmax window, both map-side-
    // combinable; ties break on the SMALLER bucket so the answer is
    // deterministic on both engines (Spark `mode()` and DuckDB
    // `mode()` leave ties unspecified — neither is used).
    QueryDef("q_agg_mode",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.events(s, d)
          .select(col("event_type"), floor(col("value")).cast("long").as("bucket"))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cnt").desc, col("bucket").asc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("bucket").as("mode_bucket"),
            col("cnt").as("mode_count"))
          .orderBy("event_type")
      },
      """SELECT event_type, bucket AS mode_bucket, cnt AS mode_count
        |FROM (
        |  SELECT event_type, bucket, cnt,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cnt DESC, bucket ASC) AS rn
        |  FROM (
        |    SELECT event_type, floor(value)::BIGINT AS bucket, count(*) AS cnt
        |    FROM events GROUP BY 1, 2) c) r
        |WHERE rn = 1 ORDER BY event_type""".stripMargin),

    // Weighted median — the revenue-weighted "typical quantity" per
    // return flag. Formulated ORDER-INDEPENDENTLY: weights aggregate
    // per DISTINCT value first (one combinable groupBy), the running
    // total walks distinct values in value order (a |distinct-values|-
    // sized window per group, not a corpus-sized one), and the median
    // is the smallest value whose doubled running weight reaches the
    // group total — no row-order tie ambiguity anywhere, all integer
    // cents until the final scale-back.
    QueryDef("q_agg_weighted_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wv = Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("qc"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("wc"))
          .groupBy("l_returnflag", "qc")
          .agg(sum(col("wc")).as("w"))
        val win = Window.partitionBy("l_returnflag").orderBy("qc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy("l_returnflag")
        wv.withColumn("cum", sum(col("w")).over(win))
          .withColumn("tot", sum(col("w")).over(tot))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy("l_returnflag")
          .agg(min(col("qc")).as("mqc"), max(col("tot")).as("totw"))
          .select(col("l_returnflag"),
            (col("mqc").cast("double") / 100).as("weighted_median_qty"),
            (col("totw").cast("double") / 100).as("total_weight"))
          .orderBy("l_returnflag")
      },
      """WITH wv AS (
        |  SELECT l_returnflag,
        |    floor(l_quantity * 100 + 0.5)::BIGINT AS qc,
        |    sum(floor(l_extendedprice * 100 + 0.5)::BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, qc, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY qc
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM wv)
        |SELECT l_returnflag,
        |  min(qc)::DOUBLE / 100 AS weighted_median_qty,
        |  max(tot)::DOUBLE / 100 AS total_weight
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // As-of join with a TOLERANCE bound (pandas merge_asof tolerance /
    // kdb wj semantics): each error matches its most recent preceding
    // click only if that click is within 24 hours — older state is
    // considered stale and the row reports no-match. Same single
    // user-keyed window pass as q_join_asof (no extra shuffle); the
    // staleness test is one more ignore-nulls running column.
    QueryDef("q_join_asof_tolerance",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(col("user_id"),
            date_trunc("MILLISECOND", col("ts")).as("tsm"),
            col("event_id"), col("value"),
            (col("event_type") === "click").cast("int").as("is_click"),
            (col("event_type") === "error").cast("int").as("is_err"))
        val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        u.withColumn("click_id",
            last(when(col("is_click") === 1, col("event_id")), ignoreNulls = true).over(w))
          .withColumn("click_tsm",
            last(when(col("is_click") === 1, col("tsm")), ignoreNulls = true).over(w))
          .filter(col("is_err") === 1)
          .withColumn("fresh",
            col("click_tsm").isNotNull &&
              col("click_tsm") >= col("tsm") - expr("interval 24 hours"))
          .select(col("user_id"), col("event_id"), col("tsm").as("err_ts"),
            when(col("fresh"), col("click_id")).otherwise(lit(-1L)).as("click_id"),
            col("fresh").as("matched"))
          .orderBy("event_id")
      },
      """WITH u AS (
        |  SELECT user_id, date_trunc('milliseconds', ts)::TIMESTAMP AS tsm,
        |    event_id, value,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        |  FROM events WHERE event_type IN ('click', 'error')),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tsm, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
        |    last_value(CASE WHEN is_click = 1 THEN tsm END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tsm, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_tsm
        |  FROM u)
        |SELECT user_id, event_id, tsm AS err_ts,
        |  CASE WHEN click_tsm IS NOT NULL
        |        AND click_tsm >= tsm - INTERVAL 24 HOUR
        |       THEN click_id ELSE -1 END AS click_id,
        |  (click_tsm IS NOT NULL
        |    AND click_tsm >= tsm - INTERVAL 24 HOUR) AS matched
        |FROM w WHERE is_err = 1 ORDER BY event_id""".stripMargin),

    // Skewness + excess kurtosis — the 3rd/4th-moment members of the
    // q_agg_stats family, from EXACT integer power sums: quantities are
    // integral ≤ 50, so Σq..Σq⁴ are exact BIGINTs far below 2^53 at any
    // realistic sf (Σq⁴ ≤ 6.25e6·N), every DOUBLE read is exact, and
    // both engines evaluate the ONE shared moment expression tree
    // identically. Neither engine's built-in skewness()/kurtosis() is
    // used — their internal accumulation orders differ.
    QueryDef("q_agg_skewkurt",
      (s, d) => {
        val q = col("l_quantity").cast("long")
        val m = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(q).as("s1"),
            sum(q * q).as("s2"), sum(q * q * q).as("s3"),
            sum(q * q * q * q).as("s4"))
          .select(col("l_returnflag"), col("n"),
            col("n").cast("double").as("nd"),
            col("s1").cast("double").as("s1d"),
            col("s2").cast("double").as("s2d"),
            col("s3").cast("double").as("s3d"),
            col("s4").cast("double").as("s4d"))
          .withColumn("mean", col("s1d") / col("nd"))
          .withColumn("m2",
            col("s2d") / col("nd") - col("mean") * col("mean"))
          .withColumn("m3",
            col("s3d") / col("nd") - lit(3) * col("mean") * (col("s2d") / col("nd"))
              + lit(2) * col("mean") * col("mean") * col("mean"))
          .withColumn("m4",
            col("s4d") / col("nd") - lit(4) * col("mean") * (col("s3d") / col("nd"))
              + lit(6) * col("mean") * col("mean") * (col("s2d") / col("nd"))
              - lit(3) * col("mean") * col("mean") * col("mean") * col("mean"))
        m.select(col("l_returnflag"), col("n"), col("mean"),
            (col("m3") / (col("m2") * sqrt(col("m2")))).as("skewness"),
            (col("m4") / (col("m2") * col("m2")) - lit(3)).as("kurtosis_excess"))
          .orderBy("l_returnflag")
      },
      """WITH r AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(l_quantity::BIGINT) AS s1,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT) AS s2,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT * l_quantity::BIGINT) AS s3,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT * l_quantity::BIGINT
        |        * l_quantity::BIGINT) AS s4
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT l_returnflag, n, n::DOUBLE AS nd, s1::DOUBLE AS s1d,
        |    s2::DOUBLE AS s2d, s3::DOUBLE AS s3d, s4::DOUBLE AS s4d
        |  FROM r),
        |mo AS (
        |  SELECT *, s1d / nd AS mean FROM c),
        |m2t AS (
        |  SELECT *, s2d / nd - mean * mean AS m2,
        |    s3d / nd - 3 * mean * (s2d / nd) + 2 * mean * mean * mean AS m3,
        |    s4d / nd - 4 * mean * (s3d / nd)
        |      + 6 * mean * mean * (s2d / nd)
        |      - 3 * mean * mean * mean * mean AS m4
        |  FROM mo)
        |SELECT l_returnflag, n, mean,
        |  m3 / (m2 * sqrt(m2)) AS skewness,
        |  m4 / (m2 * m2) - 3 AS kurtosis_excess
        |FROM m2t ORDER BY l_returnflag""".stripMargin),

    // Nearest as-of join — completes the as-of family (backward /
    // forward / tolerance / NEAREST): each error matches whichever
    // click is closer in time, before or after, ties to the backward
    // match (kdb `wj` / pandas `merge_asof direction='nearest'`
    // semantics). Both candidates come from the SAME user-keyed sort
    // (one ignore-nulls running column per direction) — no second
    // shuffle, no join; the pick is pure projection arithmetic on
    // exact epoch-ms BIGINTs.
    QueryDef("q_join_asof_nearest",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(col("user_id"),
            date_trunc("MILLISECOND", col("ts")).as("tsm"),
            col("event_id"),
            (col("event_type") === "click").cast("int").as("is_click"),
            (col("event_type") === "error").cast("int").as("is_err"))
        val wb = Window.partitionBy("user_id").orderBy("tsm", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wf = Window.partitionBy("user_id").orderBy("tsm", "event_id")
          .rowsBetween(1, Window.unboundedFollowing)
        val cid = when(col("is_click") === 1, col("event_id"))
        val cts = when(col("is_click") === 1, col("tsm"))
        val withBoth = u
          .withColumn("bid", last(cid, ignoreNulls = true).over(wb))
          .withColumn("bts", last(cts, ignoreNulls = true).over(wb))
          .withColumn("fid", first(cid, ignoreNulls = true).over(wf))
          .withColumn("fts", first(cts, ignoreNulls = true).over(wf))
          .filter(col("is_err") === 1)
          .withColumn("bdt", unix_millis(col("tsm")) - unix_millis(col("bts")))
          .withColumn("fdt", unix_millis(col("fts")) - unix_millis(col("tsm")))
        withBoth
          .select(col("user_id"), col("event_id"), col("tsm").as("err_ts"),
            when(col("bid").isNull && col("fid").isNull, lit(-1L))
              .when(col("fid").isNull, col("bid"))
              .when(col("bid").isNull, col("fid"))
              .when(col("bdt") <= col("fdt"), col("bid"))
              .otherwise(col("fid")).as("click_id"),
            when(col("bid").isNull && col("fid").isNull, lit("none"))
              .when(col("fid").isNull, lit("back"))
              .when(col("bid").isNull, lit("fwd"))
              .when(col("bdt") <= col("fdt"), lit("back"))
              .otherwise(lit("fwd")).as("direction"))
          .orderBy("event_id")
      },
      """WITH u AS (
        |  SELECT user_id, date_trunc('milliseconds', ts)::TIMESTAMP AS tsm,
        |    event_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        |  FROM events WHERE event_type IN ('click', 'error')),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
        |      OVER wb AS bid,
        |    last_value(CASE WHEN is_click = 1 THEN tsm END IGNORE NULLS)
        |      OVER wb AS bts,
        |    first_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
        |      OVER wf AS fid,
        |    first_value(CASE WHEN is_click = 1 THEN tsm END IGNORE NULLS)
        |      OVER wf AS fts
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY tsm, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  wf AS (PARTITION BY user_id ORDER BY tsm, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |e AS (
        |  SELECT user_id, event_id, tsm,
        |    bid, fid,
        |    epoch_ms(tsm) - epoch_ms(bts) AS bdt,
        |    epoch_ms(fts) - epoch_ms(tsm) AS fdt
        |  FROM w WHERE is_err = 1)
        |SELECT user_id, event_id, tsm AS err_ts,
        |  CASE WHEN bid IS NULL AND fid IS NULL THEN -1
        |       WHEN fid IS NULL THEN bid
        |       WHEN bid IS NULL THEN fid
        |       WHEN bdt <= fdt THEN bid ELSE fid END AS click_id,
        |  CASE WHEN bid IS NULL AND fid IS NULL THEN 'none'
        |       WHEN fid IS NULL THEN 'back'
        |       WHEN bid IS NULL THEN 'fwd'
        |       WHEN bdt <= fdt THEN 'back' ELSE 'fwd' END AS direction
        |FROM e ORDER BY event_id""".stripMargin),

    // Equi-width numeric histogram per group — the profiling primitive
    // behind every data-card range plot. Buckets derive arithmetically
    // from exact cents (`cents div width`, clamped) — no width_bucket
    // builtin needed, no sort, ONE map-side-combined groupBy whose
    // output is bucket-bounded (23 × |flags| rows at any corpus size).
    QueryDef("q_agg_histogram",
      (s, d) => {
        val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), cents.as("cents"))
          .select(col("l_returnflag"),
            expr("least(20L, cents div 500000L)").as("bucket"))
          .groupBy("l_returnflag", "bucket")
          .agg(count(lit(1)).as("n"))
          .select(col("l_returnflag"), col("bucket"),
            (col("bucket") * 5000).as("lo_dollars"), col("n"))
          .orderBy("l_returnflag", "bucket")
      },
      """SELECT l_returnflag,
        |  least(20, floor(l_extendedprice * 100 + 0.5)::BIGINT // 500000)::BIGINT
        |    AS bucket,
        |  least(20, floor(l_extendedprice * 100 + 0.5)::BIGINT // 500000)::BIGINT
        |    * 5000 AS lo_dollars,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY l_returnflag, bucket""".stripMargin),
  )
}
