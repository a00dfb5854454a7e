package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Relational operator surface (SURVEY.md §2.B): filters, projections,
  * guarded casts, joins (inner/outer/semi/anti/broadcast/range),
  * aggregations (group/distinct/rollup/cube), window functions, sort/limit/
  * top-k, and set operations — all stock Catalyst operators.
  *
  * Scale notes baked into each query:
  *   - joins to small dimensions are explicitly `broadcast()` (no shuffle of
  *     the fact side);
  *   - large aggregations rely on hash aggregation with map-side partial
  *     aggregation (Spark default) — keys here are low-cardinality, so the
  *     shuffle volume is ~#groups × #partitions regardless of input size;
  *   - sorts are only total where the query semantics demand total order;
  *     per-group ordering uses window functions (shuffle by group key, sort
  *     within partition — no global sort).
  */
object Relational {

  /** Exact (DECIMAL-backed) sum of a 2-dp double column, returned as double.
    * Bit-identical across engines regardless of accumulation order. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val defs: Seq[QueryDef] = Seq(

    // NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus;
    // (l_orderkey, l_linenumber, l_partkey, l_suppkey) is — all lineitem
    // orderings below use the full unique key for determinism.
    QueryDef("q_filter",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           l_quantity, l_extendedprice, l_shipdate
         FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),

    QueryDef("q_project",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        col("o_totalprice"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        upper(col("o_orderstatus")).as("status_u"),
        substring(col("o_orderpriority"), 1, 1).as("prio_class"),
        (col("o_totalprice") * 0.1).as("tithe"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_totalprice,
         year(o_orderdate)::BIGINT AS o_year, month(o_orderdate)::BIGINT AS o_month,
         upper(o_orderstatus) AS status_u, substring(o_orderpriority, 1, 1) AS prio_class,
         o_totalprice * 0.1 AS tithe
         FROM orders ORDER BY o_orderkey"""),

    // to_int / to_float reference semantics (SURVEY §1.3): digits-only → int
    // else 0; float-parse else 0.0.
    QueryDef("q_cast_guard",
      (s, d) => {
        val o = Tables.orders(s, d)
        val prioNum = try_element_at(split(col("o_orderpriority"), "-"), lit(1))
        val decStr = concat(col("o_orderkey").cast("string"), lit(".5"))
        o.select(
          col("o_orderkey"),
          when(prioNum.rlike("^[0-9]+$"), prioNum.cast("long")).otherwise(0L).as("prio_int"),
          when(col("o_orderstatus").rlike("^[0-9]+$"), col("o_orderstatus").cast("long"))
            .otherwise(0L).as("status_int"),
          coalesce(try_cast_double(decStr), lit(0.0)).as("key_float"),
          coalesce(try_cast_double(col("o_orderstatus")), lit(0.0)).as("status_float"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey,
         CASE WHEN regexp_matches(split_part(o_orderpriority, '-', 1), '^[0-9]+$')
              THEN split_part(o_orderpriority, '-', 1)::BIGINT ELSE 0 END AS prio_int,
         CASE WHEN regexp_matches(o_orderstatus, '^[0-9]+$')
              THEN o_orderstatus::BIGINT ELSE 0 END AS status_int,
         COALESCE(TRY_CAST(o_orderkey::VARCHAR || '.5' AS DOUBLE), 0.0) AS key_float,
         COALESCE(TRY_CAST(o_orderstatus AS DOUBLE), 0.0) AS status_float
         FROM orders ORDER BY o_orderkey"""),

    // Two-format timestamp parse + UTC→Eastern shift (reference A6).
    QueryDef("q_ts_parse",
      (s, d) => {
        val k = col("o_orderkey")
        val base = graft.functions.Cols.addSeconds(col("o_orderdate"), (k % 86400).cast("long"))
        val str = concat(date_format(base, "yyyy-MM-dd'T'HH:mm:ss"),
          when(k % 2 === 0, lit(".000123")).otherwise(lit("")), lit("Z"))
        val parsed = coalesce(
          try_to_timestamp(str, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
          try_to_timestamp(str, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")))
        Tables.orders(s, d).select(
          k.as("o_orderkey"),
          str.as("ts_raw"),
          date_format(parsed, "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_utc"),
          date_format(from_utc_timestamp(parsed, "America/New_York"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_eastern"))
          .orderBy("o_orderkey")
      },
      """WITH c AS (
           SELECT o_orderkey,
             strftime(o_orderdate + to_seconds(o_orderkey % 86400), '%Y-%m-%dT%H:%M:%S')
               || CASE WHEN o_orderkey % 2 = 0 THEN '.000123' ELSE '' END || 'Z' AS ts_raw
           FROM orders),
         p AS (
           SELECT o_orderkey, ts_raw,
             COALESCE(try_strptime(ts_raw, '%Y-%m-%dT%H:%M:%S.%fZ'),
                      try_strptime(ts_raw, '%Y-%m-%dT%H:%M:%SZ')) AS ts
           FROM c)
         SELECT o_orderkey, ts_raw,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_utc,
           strftime(timezone('America/New_York', timezone('UTC', ts)), '%Y-%m-%d %H:%M:%S.%f') AS ts_eastern
         FROM p ORDER BY o_orderkey"""),

    // URL decomposition (reference A10): parse_url vs regexp ground truth.
    QueryDef("q_url_path",
      (s, d) => {
        val url = concat(lit("https://example.com:8080/catalog/"),
          replace(col("p_brand"), lit("#"), lit("-")),
          lit("/"), col("p_partkey").cast("string"),
          lit("?size="), col("p_size").cast("string"), lit("#frag"))
        Tables.part(s, d).select(
          col("p_partkey"), url.as("url"),
          try_parse_url(url, lit("HOST")).as("url_host"),
          try_parse_url(url, lit("PATH")).as("url_path"),
          try_parse_url(url, lit("QUERY")).as("url_query"))
          .orderBy("p_partkey")
      },
      """WITH c AS (
           SELECT p_partkey,
             'https://example.com:8080/catalog/' || replace(p_brand, '#', '-') || '/'
               || p_partkey::VARCHAR || '?size=' || p_size::VARCHAR || '#frag' AS url
           FROM part)
         SELECT p_partkey, url,
           regexp_extract(url, '://([^/:]+)', 1) AS url_host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS url_path,
           regexp_extract(url, '\?([^#]*)', 1) AS url_query
         FROM c ORDER BY p_partkey"""),

    QueryDef("q_join_inner",
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey"""),

    QueryDef("q_join_left",
      (s, d) => {
        val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        Tables.customer(s, d)
          .join(big, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"))
      },
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
         FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
           ON c_custkey = o_custkey
         ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST"""),

    QueryDef("q_join_right",
      (s, d) => {
        val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        big.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"))
      },
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
         FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
           RIGHT JOIN customer ON o_custkey = c_custkey
         ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST"""),

    QueryDef("q_distinct",
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus"""),

    QueryDef("q_having",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey"),
      """SELECT o_custkey, count(*) AS n_orders,
           (SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE AS spend
         FROM orders GROUP BY o_custkey HAVING count(*) >= 15
         ORDER BY o_custkey"""),

    QueryDef("q_join_full",
      (s, d) => {
        val ca = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sa = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        ca.join(sa, Seq("nationkey"), "full")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      """SELECT COALESCE(a.nationkey, b.nationkey) AS nationkey,
           COALESCE(n_cust, 0)::BIGINT AS n_cust, COALESCE(n_supp, 0)::BIGINT AS n_supp
         FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) a
         FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) b
           USING (nationkey)
         ORDER BY nationkey"""),

    QueryDef("q_join_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey"""),

    QueryDef("q_join_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey"""),

    // Star join with explicit broadcast of every dimension: the fact table
    // never shuffles for the join (only for the final aggregation).
    QueryDef("q_join_broadcast",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name"),
      """SELECT r_name, n_name,
           (SUM(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS revenue,
           count(*) AS n_items
         FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name"""),

    // Non-equi (banded range) join; at scale this is the classic candidate
    // for a broadcast-nested-loop on the small side, which Catalyst picks
    // when one side fits the broadcast threshold.
    QueryDef("q_join_range",
      (s, d) => Tables.supplier(s, d)
        .join(Tables.customer(s, d),
          col("c_acctbal") >= col("s_acctbal") - 100 &&
            col("c_acctbal") <= col("s_acctbal") + 100)
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
        .orderBy("s_suppkey", "c_custkey"),
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
         FROM supplier JOIN customer
           ON c_acctbal >= s_acctbal - 100 AND c_acctbal <= s_acctbal + 100
         ORDER BY s_suppkey, c_custkey"""),

    // Same band join via bucket quantization (graft.ops.Joins.bandJoin):
    // a shuffled equi-join on floor(value/width) buckets instead of the
    // broadcast-nested-loop plan — identical results (same oracle), scale
    // path for when neither side fits a broadcast.
    QueryDef("q_join_range_bucketed",
      (s, d) => graft.ops.Joins.bandJoin(
          Tables.supplier(s, d), Tables.customer(s, d),
          "s_acctbal", "c_acctbal", 100.0)
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
        .orderBy("s_suppkey", "c_custkey"),
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
         FROM supplier JOIN customer
           ON c_acctbal >= s_acctbal - 100 AND c_acctbal <= s_acctbal + 100
         ORDER BY s_suppkey, c_custkey"""),

    // TPC-H Q1-shaped aggregation: partial (map-side) agg makes the shuffle
    // O(#groups), independent of input scale.
    QueryDef("q_agg_group",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
           (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty,
           (SUM(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS sum_base_price,
           (SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))))::DOUBLE AS sum_disc_price,
           (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE / count(*) AS avg_qty,
           count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""),

    QueryDef("q_agg_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    QueryDef("q_agg_rollup",
      (s, d) => Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("total"), col("g_status"), col("g_prio"))
        .orderBy("g_status", "g_prio", "status", "prio"),
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS prio,
           count(*) AS n, (SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE AS total,
           GROUPING(o_orderstatus)::BIGINT AS g_status,
           GROUPING(o_orderpriority)::BIGINT AS g_prio
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_prio, status, prio"""),

    QueryDef("q_agg_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"), col("g_rf"), col("g_ls"))
        .orderBy("g_rf", "g_ls", "rf", "ls"),
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
           count(*) AS n, (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty,
           GROUPING(l_returnflag)::BIGINT AS g_rf, GROUPING(l_linestatus)::BIGINT AS g_ls
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, rf, ls"""),

    QueryDef("q_window_rank",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.customer(s, d).select(
          col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_nationkey, c_acctbal,
           row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
         ORDER BY c_custkey"""),

    QueryDef("q_window_lag",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)).as("prev_price"),
          coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)).as("next_price"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           COALESCE(lag(o_totalprice, 1) OVER w, -1.0) AS prev_price,
           COALESCE(lead(o_totalprice, 1) OVER w, -1.0) AS next_price
         FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderdate, o_orderkey"""),

    QueryDef("q_window_frame",
      (s, d) => {
        val w = Window.partitionBy("l_orderkey")
          .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"),
          sum(dec(col("l_quantity")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_qty"),
          sum(dec(col("l_quantity"))).over(w.rowsBetween(-1, 0))
            .cast("double").as("qty_2row"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
           (SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w1)::DOUBLE AS running_qty,
           (SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w2)::DOUBLE AS qty_2row
         FROM lineitem
         WINDOW
           w1 AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
                  ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),

    QueryDef("q_sort",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_partkey").asc, col("l_suppkey").asc),
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, l_extendedprice
         FROM lineitem
         ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey ASC,
                  l_linenumber ASC, l_partkey ASC, l_suppkey ASC"""),

    QueryDef("q_limit",
      (s, d) => Tables.orders(s, d)
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(50),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 50"""),

    // Per-group top-k: window rank + filter — shuffles once by group key;
    // no global sort of the fact table.
    QueryDef("q_topk",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 2)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t
         WHERE rn <= 2 ORDER BY o_custkey, rn"""),

    QueryDef("q_union",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk"),
      """SELECT c_nationkey AS nk FROM customer
         UNION SELECT s_nationkey FROM supplier ORDER BY nk"""),

    QueryDef("q_intersect",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk"""),

    QueryDef("q_except",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk"""),

    // Bag-semantics set ops — distinct OPERATORS from the set versions
    // above: multiplicities subtract/min instead of collapsing, planned
    // as aggregate-count + generate rather than a distinct-based join.
    QueryDef("q_except_all",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY nk"""),

    QueryDef("q_intersect_all",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY nk"""),

    // NULL-AWARE anti join — the `NOT IN (subquery)` three-valued-logic
    // trap, exercised on purpose: against a null-free subquery NOT IN
    // behaves like a plain anti join; add ONE NULL to the subquery and
    // ANSI semantics say `x NOT IN (…, NULL)` is never TRUE, so the
    // result is EMPTY. Both behaviors in one row, so the compare pins
    // the semantics rather than assuming them. Spark plans the null-
    // aware branch as a broadcast null-aware anti join (NAAJ) — the
    // single-column BuildRight special case — and the null-free branch
    // as a regular anti join; both go through the SQL frontend here
    // precisely because the DataFrame API cannot express NOT IN.
    QueryDef("q_join_notin",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT
            (SELECT count(*) FROM customer_v
             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v
                                     WHERE o_totalprice > 150000))
              AS n_no_big_orders,
            (SELECT count(*) FROM customer_v
             WHERE c_custkey NOT IN (
               SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                           ELSE o_custkey END
               FROM orders_v WHERE o_totalprice > 150000))
              AS n_vs_nullable""")
      },
      """SELECT
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice > 150000))
             AS n_no_big_orders,
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (
              SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                          ELSE o_custkey END
              FROM orders WHERE o_totalprice > 150000))
             AS n_vs_nullable"""),
  )

  /** ANSI-safe double parse: regex-guarded cast, null on failure —
    * mirrors DuckDB TRY_CAST(... AS DOUBLE) for plain/scientific decimals. */
  private def try_cast_double(c: Column): Column =
    when(c.rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
      c.cast("double"))
}
