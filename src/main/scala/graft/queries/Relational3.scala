package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Third relational batch: RANGE window frames, navigation window
  * functions, arg-max aggregation, regex functions, cross join, and
  * SQL-frontend subqueries. */
object Relational3 {

  val defs: Seq[QueryDef] = Seq(

    // RANGE frame (value-based window): frame membership depends only on
    // the order value, so ties don't threaten determinism.
    QueryDef("q_window_range",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
          .rangeBetween(-50000L, 0L)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_band"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("band_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey, o_totalprice,
           count(*) OVER w AS n_in_band,
           (SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w)::DOUBLE AS band_total
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey"""),

    QueryDef("q_window_nav",
      (s, d) => {
        val ord = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.customer(s, d).select(
          col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          first(col("c_custkey")).over(full).as("richest"),
          last(col("c_custkey")).over(full).as("poorest"),
          nth_value(col("c_custkey"), 2).over(full).as("second"),
          ntile(4).over(ord).cast("long").as("quartile"),
          percent_rank().over(ord).as("pct_rank"),
          cume_dist().over(ord).as("cume"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_nationkey, c_acctbal,
           first_value(c_custkey) OVER wf AS richest,
           last_value(c_custkey) OVER wf AS poorest,
           nth_value(c_custkey, 2) OVER wf AS second,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
         FROM customer
         WINDOW
           w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC),
           wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY c_custkey"""),

    // arg-max/arg-min with a collision-free composite ordering value
    // (price-cents ⋅ 10⁹ + key — exact in int64 on both engines).
    QueryDef("q_agg_minmaxby",
      (s, d) => {
        val ordVal = (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long") * 1000000000L + col("o_orderkey")
        Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .agg(max_by(col("o_orderkey"), ordVal).as("biggest_order"),
            min_by(col("o_orderkey"), ordVal).as("smallest_order"),
            max(col("o_totalprice")).as("max_price"),
            min(col("o_totalprice")).as("min_price"))
          .orderBy("o_orderstatus")
      },
      """SELECT o_orderstatus,
           arg_max(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 1000000000 + o_orderkey) AS biggest_order,
           arg_min(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 1000000000 + o_orderkey) AS smallest_order,
           max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    QueryDef("q_string_fns2",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        translate(col("p_brand"), "#", "_").as("brand_tr"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        reverse(col("p_name")).as("name_rev"),
        ascii(col("p_name")).cast("long").as("first_code"),
        substring(col("p_name"), 1, 3).as("name_left"),
        col("p_name").substr(length(col("p_name")) - 2, lit(3)).as("name_right"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("brand_type_dist"),
        col("p_name").contains("a").as("has_a"),
        col("p_name").startsWith("s").as("starts_s"),
        col("p_name").endsWith("e").as("ends_e"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
           translate(p_brand, '#', '_') AS brand_tr,
           repeat(p_brand, 2) AS brand_x2,
           reverse(p_name) AS name_rev,
           ascii(p_name)::BIGINT AS first_code,
           left(p_name, 3) AS name_left,
           right(p_name, 3) AS name_right,
           levenshtein(p_brand, p_type)::BIGINT AS brand_type_dist,
           contains(p_name, 'a') AS has_a,
           starts_with(p_name, 's') AS starts_s,
           ends_with(p_name, 'e') AS ends_e
         FROM part ORDER BY p_partkey"""),

    QueryDef("q_regex_fns",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("name_devoweled"),
        // array output → CSV string: the driver's pandas compare cannot
        // hash list cells (words are [a-z]+ so ',' never collides)
        concat_ws(",", regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)))
          .as("name_words_csv"),
        regexp_count(col("p_name"), lit("a")).cast("long").as("n_a"),
        col("p_type").rlike("^[a-z]+ ").as("type_two_words"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devoweled,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS name_words_csv,
           len(regexp_extract_all(p_name, 'a'))::BIGINT AS n_a,
           regexp_matches(p_type, '^[a-z]+ ') AS type_two_words
         FROM part ORDER BY p_partkey"""),

    // Explicit GROUPING SETS (beyond rollup/cube), through the SQL frontend.
    QueryDef("q_agg_groupingsets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql("""
          SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                 COALESCE(o_orderpriority, 'ALL') AS prio,
                 count(*) AS n,
                 CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                 CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY g_status, g_prio, status, prio""")
      },
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS prio,
           count(*) AS n,
           GROUPING(o_orderstatus)::BIGINT AS g_status,
           GROUPING(o_orderpriority)::BIGINT AS g_prio
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY g_status, g_prio, status, prio"""),

    QueryDef("q_date_fns2",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("as_date"),
        expr("""make_timestamp(year(o_orderdate), month(o_orderdate),
                 day(o_orderdate), 6, 30, 0)""").as("rebuilt_0630"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
           weekofyear(o_orderdate)::BIGINT AS iso_week,
           dayofyear(o_orderdate)::BIGINT AS doy,
           strftime(o_orderdate::DATE, '%Y-%m-%d') AS as_date,
           make_timestamp(year(o_orderdate), month(o_orderdate),
                          day(o_orderdate), 6, 30, 0) AS rebuilt_0630
         FROM orders ORDER BY o_orderkey"""),

    QueryDef("q_bit_fns",
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("k_and"),
        (col("l_orderkey").bitwiseOR(col("l_partkey"))).as("k_or"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("k_xor"),
        shiftleft(col("l_linenumber"), 3).cast("long").as("ln_shl"),
        shiftright(col("l_partkey"), 2).as("pk_shr"),
        bit_count(col("l_suppkey")).cast("long").as("sk_bits"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           l_orderkey & l_partkey AS k_and,
           l_orderkey | l_partkey AS k_or,
           xor(l_orderkey, l_partkey) AS k_xor,
           (l_linenumber << 3)::BIGINT AS ln_shl,
           l_partkey >> 2 AS pk_shr,
           bit_count(l_suppkey)::BIGINT AS sk_bits
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),

    // collect_list/collect_set are order-nondeterministic under parallel
    // aggregation — sorting the collected array restores a stable value.
    // The sorted array is rendered to a CSV string (integer formatting is
    // engine-identical) because the driver's compare cannot hash list cells.
    QueryDef("q_agg_collect",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(concat_ws(",", transform(array_sort(collect_set(col("l_linenumber"))),
            x => x.cast("string"))).as("linenumbers_csv"),
          size(collect_list(col("l_linenumber"))).cast("long").as("n_collected"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
           array_to_string(list_transform(list_sort(list(DISTINCT l_linenumber)),
             x -> x::VARCHAR), ',') AS linenumbers_csv,
           len(list(l_linenumber))::BIGINT AS n_collected
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Reproducible sampling for training pipelines: a multiplicative hash
    // of the key modulo the sample space — deterministic, engine-neutral,
    // and stable across reruns/scales (unlike TABLESAMPLE).
    QueryDef("q_sample",
      (s, d) => Tables.orders(s, d)
        .filter((col("o_orderkey") * 2654435761L) % 100 < 5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders WHERE (o_orderkey * 2654435761) % 100 < 5
         ORDER BY o_orderkey"""),

    // Boolean aggregates, null-aware counting, deterministic string agg.
    QueryDef("q_agg_bool",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
          count(nullif(col("o_orderpriority"), lit("1-URGENT"))).as("n_not_urgent"),
          count(lit(1)).as("n_total"),
          concat_ws(",", array_sort(collect_set(col("o_orderpriority"))))
            .as("priorities_csv"))
        .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           count(nullif(o_orderpriority, '1-URGENT')) AS n_not_urgent,
           count(*) AS n_total,
           list_aggregate(list_sort(list(DISTINCT o_orderpriority)), 'string_agg', ',')
             AS priorities_csv
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    QueryDef("q_join_cross",
      (s, d) => Tables.region(s, d).as("a")
        .crossJoin(Tables.region(s, d).as("b"))
        .select(col("a.r_name").as("r1"), col("b.r_name").as("r2"))
        .orderBy("r1", "r2"),
      """SELECT a.r_name AS r1, b.r_name AS r2
         FROM region a CROSS JOIN region b ORDER BY r1, r2"""),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): nulls match
    // nulls — the semantics dedup/merge pipelines need for nullable keys.
    QueryDef("q_join_nullsafe",
      (s, d) => {
        val a = Tables.orders(s, d).select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("k"))
        val b = Tables.orders(s, d)
          .groupBy(nullif(col("o_orderstatus"), lit("P")).as("k"))
          .agg(count(lit(1)).as("n_same_status"))
        a.join(b, a("k") <=> b("k"))
          .select(col("o_orderkey"), a("k").as("status_key"), col("n_same_status"))
          .orderBy("o_orderkey")
      },
      """WITH a AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k FROM orders),
         b AS (SELECT nullif(o_orderstatus, 'P') AS k, count(*) AS n_same_status
               FROM orders GROUP BY 1)
         SELECT o_orderkey, a.k AS status_key, n_same_status
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
         ORDER BY o_orderkey"""),

    // Unpivot / melt: wide metric columns → long (metric, value) rows.
    QueryDef("q_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "metric"),
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, metric, value
         FROM (
           SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             'l_quantity' AS metric, l_quantity AS value FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             'l_discount', l_discount FROM lineitem) t
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, metric"""),

    // SQL frontend: correlated EXISTS + uncorrelated scalar subquery,
    // parsed and planned by Spark SQL over temp views.
    QueryDef("q_sql_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT c_custkey, c_name, c_acctbal
          FROM customer_v
          WHERE c_acctbal > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                               / COUNT(*) / 100 FROM orders_v)
            AND EXISTS (SELECT 1 FROM orders_v
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          ORDER BY c_custkey""")
      },
      """SELECT c_custkey, c_name, c_acctbal
         FROM customer
         WHERE c_acctbal > (SELECT (SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE
                              / COUNT(*) / 100 FROM orders)
           AND EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey"""),

    // Correlated SCALAR subquery — the TPC-H Q17 shape q_sql_subquery's
    // uncorrelated scalar + correlated EXISTS don't cover: each order is
    // compared against ITS OWN customer's average order value. Catalyst
    // cannot execute this row-at-a-time; it must decorrelate into a
    // per-customer aggregate joined back on the correlation key — the
    // rewrite (DecorrelateInnerQuery) this query exists to exercise.
    // Determinism: the average is the exact DECIMAL sum divided once in
    // DOUBLE (the q_sql_subquery recipe), identical on both engines.
    // Scale shape post-decorrelation: one map-side-combined aggregate
    // over orders + one custkey equi-join — no per-row subquery, no
    // nested loop.
    QueryDef("q_sql_correlated",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_corr_v")
        s.sql("""
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders_corr_v o
          WHERE o_totalprice > 2 * (
            SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
            FROM orders_corr_v i WHERE i.o_custkey = o.o_custkey)
          ORDER BY o_orderkey""")
      },
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders o
         WHERE o_totalprice > 2 * (
           SELECT (SUM(CAST(i.o_totalprice AS DECIMAL(18,2))))::DOUBLE / COUNT(*)
           FROM orders i WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey"""),

    // Distinct counting over a running window — an operator Spark has NO
    // direct form for (COUNT(DISTINCT) OVER is unsupported): the
    // documented rewrite is size(collect_set() OVER w), which this query
    // pins against an independent oracle formulation
    // (len(list_distinct(list() OVER w)) — DuckDB's window DISTINCT
    // support is likewise partial, so the oracle uses the same
    // list-based identity rather than a native DISTINCT window).
    // State per (customer) window is the distinct-value set — bounded by
    // the 5-value priority domain here; at an unbounded domain the
    // approx path (HLL sketch per frame) is the scale answer, noted in
    // SCALING.md.
    QueryDef("q_window_countdistinct",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            size(collect_set(col("o_orderpriority")).over(w))
              .cast("long").as("distinct_priorities"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_custkey, o_orderdate,
           len(list_distinct(list(o_orderpriority) OVER w))::BIGINT
             AS distinct_priorities
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey"""),

    // The SCALE path for q_window_countdistinct: an HLL sketch per frame
    // (Spark 4's datasketches hll_sketch_agg/estimate) instead of a
    // materialized distinct-value set — O(sketch) window state at ANY
    // value cardinality where collect_set grows with the domain. The
    // sketch is EXACT on this domain (HLL's sparse mode is exact far
    // beyond the 5-value priority space), so the estimate itself is the
    // oracle-checked output: DuckDB states the exact distinct count via
    // the list identity (its window DISTINCT support is partial) and
    // the driver hash-compares estimate against exact per row — the
    // strongest possible gate for this sketch (Round9Spec pins the same
    // equality against the collect_set twin in-test).
    QueryDef("q_window_countdistinct_approx",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            hll_sketch_estimate(hll_sketch_agg(col("o_orderpriority")).over(w))
              .as("approx_priorities"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_custkey, o_orderdate,
           len(list_distinct(list(o_orderpriority) OVER w))::BIGINT
             AS approx_priorities
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey"""),

    // Mergeable-sketch rollup: per-type HLL user sketches UNIONED into
    // the all-types distinct count (hll_union_agg) — the property that
    // makes sketch cubes work at 100 TB: distinct counts re-aggregate
    // WITHOUT revisiting the data (a pre-aggregated daily sketch table
    // rolls up to any coarser grain; exact distincts cannot). The
    // per-type sketch pass is the only corpus-scaled work; the union
    // runs over |types| sketch blobs. Sketch blobs differ per engine,
    // so the query emits its CALIBRATION: the exact distinct count per
    // grain (SQL-mirrored) plus a within-1%-of-exact boolean on every
    // estimate — comfortable headroom on a domain where sparse-mode
    // HLL is exact (Round9bSpec pins strict equality in-test, and the
    // rollup == the direct global sketch). The oracle states the exact
    // side and pins the booleans TRUE.
    // Recursive CTE (Spark 4's WITH RECURSIVE / UnionLoopExec): walk
    // the synthetic key-division forest (child k → parent k div 10,
    // roots k < 10) to its roots, emitting (key, root, depth) — the
    // hierarchy/transitive-closure query BOM explosions, org charts,
    // and category trees need, running through the SQL FRONTEND rather
    // than the repo's hand-unrolled iteration (q_graph_bfs /
    // q_dedup_cluster show the DataFrame-loop equivalent; this pins
    // the declarative form Spark now plans natively).
    //
    // Scale shape: each UnionLoop iteration is one equi-join of the
    // remaining children against the previous frontier on the parent
    // key — the same per-round join/shuffle profile as the unrolled
    // loops, with depth bounded by log10(keyspace). Termination is
    // structural (every key strictly shrinks under div 10), no cycle
    // risk; integer arithmetic end to end.
    QueryDef("q_sql_recursive",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_rec")
        s.sql("""
          WITH RECURSIVE anc(key, root, depth) AS (
            SELECT o_orderkey, o_orderkey, 0L FROM orders_rec WHERE o_orderkey < 10
            UNION ALL
            SELECT c.o_orderkey, a.root, a.depth + 1L
            FROM orders_rec c JOIN anc a ON c.o_orderkey div 10 = a.key
            WHERE c.o_orderkey >= 10)
          SELECT key, root, depth FROM anc ORDER BY key""")
      },
      """WITH RECURSIVE anc(key, root, depth) AS (
        |  SELECT o_orderkey, o_orderkey, 0::BIGINT FROM orders WHERE o_orderkey < 10
        |  UNION ALL
        |  SELECT c.o_orderkey, a.root, a.depth + 1
        |  FROM orders c JOIN anc a ON c.o_orderkey // 10 = a.key
        |  WHERE c.o_orderkey >= 10)
        |SELECT key, root, depth FROM anc ORDER BY key""".stripMargin),

    QueryDef("q_agg_hll_union",
      (s, d) => {
        val ev = Tables.events(s, d)
        val sk = ev.groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            countDistinct(col("user_id")).as("n_users_exact"))
        val per = sk.select(col("event_type"), col("n_users_exact"),
          hll_sketch_estimate(col("sk")).as("est"))
        val all = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .crossJoin(broadcast(
            ev.agg(countDistinct(col("user_id")).as("n_users_exact"))))
          .select(lit("__all__").as("event_type"), col("n_users_exact"),
            col("est"))
        per.unionAll(all)
          .select(col("event_type"), col("n_users_exact"),
            (abs(col("est") - col("n_users_exact")).cast("double") <=
              col("n_users_exact") * 0.01).as("est_within_1pct"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users_exact,
           true AS est_within_1pct
         FROM events GROUP BY event_type
         UNION ALL
         SELECT '__all__', count(DISTINCT user_id)::BIGINT, true FROM events
         ORDER BY event_type"""),
  )
}
