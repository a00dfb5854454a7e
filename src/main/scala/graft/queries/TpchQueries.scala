package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second TPC-H-shape batch — the remaining classic queries expressible
  * over this corpus's star schema (no `partsupp`, no comment/receipt
  * columns, so Q11/Q12/Q16/Q20 are out of reach and Q2/Q9 are adapted —
  * Q9 uses `p_retailprice` as the cost column the missing partsupp
  * would supply; Q1/Q3/Q4/Q5/Q7/Q10 already live in
  * Relational4/Relational2). Same exact-cents
  * money discipline as Relational4: 2-decimal doubles → BIGINT cents via
  * `floor(x·100+0.5)`, all aggregation in integer space (associative,
  * order-independent, overflow-safe to ~9e16 cents²-scale products),
  * one final IEEE double division both engines share bit-for-bit.
  *
  * Correlated thresholds (Q17's 0.2·avg, Q22's avg positive balance)
  * are rewritten as INTEGER cross-multiplications — `5·qty·cnt < Σqty`
  * instead of `qty < 0.2·Σqty/cnt` — so the oracle comparison never
  * touches a double at all.
  */
object TpchQueries {

  /** Exact cent count of a 2-decimal quantity stored as double. */
  private def cents(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")
  private def centsSql(c: String): String =
    s"floor($c * 100 + 0.5)::BIGINT"
  /** rev = extendedprice·(1−discount) in cents² (divide by 1e4 at the end). */
  private def revC(): Column =
    cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
  private val revSql =
    s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q6 shape — revenue-change forecast: pure scan-filter-agg,
    // zero joins, zero shuffles beyond the single-row partial merge.
    // All three predicates (shipdate range, discount band, quantity cap)
    // push into the parquet scan as min/max row-group filters; at 100 TB
    // this query is I/O-bound on exactly the 4 referenced columns.
    // The discount band compares in CENTS (5..7), not doubles — 0.05
    // stored as a double is not exactly 0.05.
    QueryDef("q_tpch_forecast",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          cents(col("l_discount")).between(5, 7) &&
          col("l_quantity") < 24)
        .agg(
          (sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
            .cast("double") / 1e4).as("revenue"),
          count(lit(1)).as("n_items")),
      s"""SELECT
           sum(${centsSql("l_extendedprice")} * ${centsSql("l_discount")})::DOUBLE / 1e4 AS revenue,
           count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND ${centsSql("l_discount")} BETWEEN 5 AND 7
           AND l_quantity < 24"""),

    // TPC-H Q8 shape — national market share: of all PROMO-type parts
    // sold into ASIA over two years, what fraction of revenue came from
    // NATION_5 suppliers, per year. Five dimension legs hang off the
    // lineitem fact; every one of them (filtered part slice, ASIA
    // customers' nation set, supplier→nation) is orders-of-magnitude
    // smaller than the fact and broadcastable — the only fact-sized
    // shuffle is lineitem⋈orders on orderkey. The share is a ratio of
    // two exact BIGINT cent sums; the single final division is IEEE-
    // identical in both engines.
    QueryDef("q_tpch_marketshare",
      (s, d) => {
        val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
          .select("p_partkey")
        val asiaNat = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("asia_natkey"))
        val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(asiaNat), col("c_nationkey") === col("asia_natkey"))
          .select("c_custkey")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year"))
        val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation")
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            revC().as("rev"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy("o_year")
          .agg(
            sum(when(col("supp_nation") === "NATION_5", col("rev"))
              .otherwise(lit(0L))).as("nat_rev"),
            sum(col("rev")).as("tot_rev"))
          .select(col("o_year"),
            (col("nat_rev").cast("double") / col("tot_rev").cast("double"))
              .as("mkt_share"),
            (col("tot_rev").cast("double") / 1e4).as("total_revenue"))
          .orderBy("o_year")
      },
      s"""SELECT o_year,
           sum(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE 0 END)::DOUBLE
             / sum(rev)::DOUBLE AS mkt_share,
           sum(rev)::DOUBLE / 1e4 AS total_revenue
         FROM (
           SELECT year(o_orderdate)::BIGINT AS o_year, sn.n_name AS supp_nation,
             $revSql AS rev
           FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation cn ON c_nationkey = cn.n_nationkey
             JOIN region ON cn.n_regionkey = r_regionkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation sn ON s_nationkey = sn.n_nationkey
           WHERE p_type = 'PROMO' AND r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01') v
         GROUP BY o_year ORDER BY o_year"""),

    // TPC-H Q13 shape — customer order-count distribution: LEFT join so
    // zero-order customers survive with count 0, then a histogram over
    // the per-customer counts. Two aggregations, but only the first is
    // fact-sized (shuffle on custkey); the second reduces |customers|
    // rows to ≤ max-order-count groups. count(o_orderkey) (not *)
    // is what makes the LEFT-join null rows count as 0.
    QueryDef("q_tpch_custdist",
      (s, d) => Tables.customer(s, d).select("c_custkey")
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      """SELECT c_count, count(*) AS custdist
         FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
           GROUP BY c_custkey) v
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC"""),

    // TPC-H Q14 shape — promotion effect: what % of one quarter's
    // revenue came from PROMO-type parts. lineitem⋈part on partkey is
    // the only join; part is the dimension side (broadcast here; at
    // 100 TB AQE picks broadcast iff the filtered build side fits,
    // else a shuffle join on partkey — either way the date filter has
    // already shrunk the probe side at the scan). Ratio of exact cent
    // sums ×100.
    QueryDef("q_tpch_promo",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-06-01").cast("timestamp"))
        .select(col("l_partkey"), revC().as("rev"))
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0L)))
            .cast("double") * 100 /
            sum(col("rev")).cast("double")).as("promo_revenue_pct"),
          (sum(col("rev")).cast("double") / 1e4).as("total_revenue")),
      s"""SELECT
           sum(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE 0 END)::DOUBLE * 100
             / sum($revSql)::DOUBLE AS promo_revenue_pct,
           sum($revSql)::DOUBLE / 1e4 AS total_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-03-01'
           AND l_shipdate < TIMESTAMP '1997-06-01'"""),

    // TPC-H Q15 shape — top supplier: per-supplier revenue over one
    // quarter, then the supplier(s) achieving the maximum. The max is a
    // 1-row aggregate of the 100-row (at any sf: |supplier|-row)
    // per-supplier rollup, broadcast back as a semi-filter — NOT a
    // window over a global sort. Ties (impossible in cents only by
    // luck) would all surface, matching the spec's view semantics.
    QueryDef("q_tpch_topsupplier",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(sum(revC()).as("revc"))
        val top = rev.agg(max(col("revc")).as("maxrev"))
        rev.join(broadcast(top), col("revc") === col("maxrev"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            (col("revc").cast("double") / 1e4).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      s"""WITH rev AS (
           SELECT l_suppkey, sum($revSql) AS revc
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, revc::DOUBLE / 1e4 AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE revc = (SELECT max(revc) FROM rev)
         ORDER BY s_suppkey"""),

    // TPC-H Q17 shape — small-quantity-order revenue: for one brand,
    // revenue from line items whose quantity is below 20% of that
    // part's average quantity. The correlated per-part average becomes
    // a per-part aggregate joined back (two passes over the brand's
    // slice only — the brand filter reaches the part scan, and the
    // semi-joined lineitem slice is |brand| parts wide, not corpus
    // wide). The 0.2·avg comparison is cross-multiplied into BIGINT:
    // 5·qty·cnt < Σqty — zero doubles in the predicate.
    QueryDef("q_tpch_smallqty",
      (s, d) => {
        val p = Tables.part(s, d).filter(col("p_brand") === "Brand#23")
          .select("p_partkey")
        val l = Tables.lineitem(s, d)
          .select(col("l_partkey"), cents(col("l_quantity")).as("qtyc"),
            cents(col("l_extendedprice")).as("epc"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        val avg = l.groupBy(col("l_partkey").as("a_partkey"))
          .agg(sum(col("qtyc")).as("sum_qtyc"), count(lit(1)).as("cnt"))
        l.join(broadcast(avg), col("l_partkey") === col("a_partkey"))
          .filter(col("qtyc") * col("cnt") * 5 < col("sum_qtyc"))
          .agg(
            (sum(col("epc")).cast("double") / 100 / 7.0).as("avg_yearly"),
            count(lit(1)).as("n_items"))
      },
      s"""WITH l AS (
           SELECT l_partkey, ${centsSql("l_quantity")} AS qtyc,
             ${centsSql("l_extendedprice")} AS epc
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#23'),
         a AS (
           SELECT l_partkey AS a_partkey, sum(qtyc) AS sum_qtyc,
             count(*) AS cnt
           FROM l GROUP BY l_partkey)
         SELECT sum(epc)::DOUBLE / 100 / 7.0 AS avg_yearly,
           count(*) AS n_items
         FROM l JOIN a ON l_partkey = a_partkey
         WHERE qtyc * cnt * 5 < sum_qtyc"""),

    // TPC-H Q18 shape — large-volume orders: orders whose total line
    // quantity exceeds a threshold, with customer attribution, top-100
    // by order value. The HAVING pre-aggregates lineitem per order
    // BEFORE any dimension join, so orders/customer join only the
    // surviving sliver; TakeOrdered(100) avoids a global sort.
    QueryDef("q_tpch_bigorders",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(cents(col("l_quantity"))).as("sum_qtyc"))
          .filter(col("sum_qtyc") > 150 * 100L)
        big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            (col("sum_qtyc").cast("double") / 100).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
            col("o_orderkey").asc)
          .limit(100)
      },
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum_qtyc::DOUBLE / 100 AS sum_qty
         FROM (
           SELECT l_orderkey, sum(${centsSql("l_quantity")}) AS sum_qtyc
           FROM lineitem GROUP BY l_orderkey
           HAVING sum(${centsSql("l_quantity")}) > 15000) v
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
         LIMIT 100"""),

    // TPC-H Q19 shape — disjunctive discounted revenue: three
    // (brand, size-band, quantity-band) OR-branches that each need the
    // joined part row. The common structure (join on partkey, p_size
    // and l_quantity bounds) lets the optimizer derive the residual
    // part filter p_brand IN (…) ∧ p_size ≤ 30 and push it below the
    // join; the OR itself evaluates post-join in codegen. Single-row
    // exact-cents output.
    QueryDef("q_tpch_disjunct",
      (s, d) => {
        val l = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"), revC().as("rev"))
        val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
        val cond =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 25)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 35))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg((sum(col("rev")).cast("double") / 1e4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      s"""SELECT sum($revSql)::DOUBLE / 1e4 AS revenue, count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
                AND l_quantity BETWEEN 10 AND 25)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
                AND l_quantity BETWEEN 20 AND 35)"""),

    // TPC-H Q22 shape — global sales opportunity: customers with
    // above-average positive balances and no RECENT orders (no orders
    // in the corpus's final year — the literal "no orders ever" of
    // spec Q22 matches zero customers in this dense corpus), grouped
    // by a 2-char "country code" carved from the tail of c_name (the corpus
    // has no phone column; the leading digits are constant zero-padding). The scalar avg threshold is cross-multiplied
    // to BIGINT (bal·cnt > Σbal over positive balances) and broadcast
    // as a 1-row frame; the lapsed test is a left-anti join on the
    // date-filtered orders key projection — the only fact-sized work,
    // it carries custkey alone, and the date predicate pushes into the
    // orders scan. Balance sums in exact cents.
    QueryDef("q_tpch_opportunity",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(substring(col("c_name"), 17, 2).as("cntrycode"),
            col("c_custkey"), cents(col("c_acctbal")).as("balc"))
        val thr = c.filter(col("balc") > 0)
          .agg(sum(col("balc")).as("sum_balc"), count(lit(1)).as("cnt_bal"))
        c.join(broadcast(thr))
          .filter(col("balc") * col("cnt_bal") > col("sum_balc"))
          .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-09-01").cast("timestamp"))
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("cntrycode")
          .agg(count(lit(1)).as("numcust"),
            (sum(col("balc")).cast("double") / 100).as("totacctbal"))
          .orderBy("cntrycode")
      },
      s"""WITH c AS (
           SELECT substr(c_name, 17, 2) AS cntrycode, c_custkey,
             ${centsSql("c_acctbal")} AS balc
           FROM customer),
         t AS (
           SELECT sum(balc) AS sum_balc, count(*) AS cnt_bal
           FROM c WHERE balc > 0)
         SELECT cntrycode, count(*) AS numcust,
           sum(balc)::DOUBLE / 100 AS totacctbal
         FROM c, t
         WHERE balc * cnt_bal > sum_balc
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_orderdate >= TIMESTAMP '2000-09-01')
         GROUP BY cntrycode ORDER BY cntrycode"""),

    // TPC-H Q2 shape — min-cost supplier: for each part in a narrow
    // slice, the supplier offering the lowest average sell price (the
    // corpus has no partsupp, so lineitem history IS the part-supplier
    // price relation). The correlated `price = min(price per part)`
    // becomes a row_number window per partkey ordered by (avg price,
    // suppkey) — ties resolve deterministically on the key. Scale
    // shape: the broadcast part-slice semi-filters lineitem BEFORE the
    // (partkey, suppkey) rollup, so both the aggregate and the window
    // see only the slice's rows; supplier/nation are broadcast dims.
    // The avg is ONE IEEE division of exact BIGINT cents by an exact
    // count — identical ordering on both engines.
    QueryDef("q_tpch_mincost",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val p = Tables.part(s, d)
          .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
          .select("p_partkey", "p_brand")
        val ps = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            cents(col("l_extendedprice")).as("epc"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_partkey", "p_brand", "l_suppkey")
          .agg(sum(col("epc")).as("sumc"), count(lit(1)).as("cnt"))
          .withColumn("avgp",
            col("sumc").cast("double") / col("cnt").cast("double") / 100)
        val w = Window.partitionBy(col("p_partkey"))
          .orderBy(col("avgp").asc, col("l_suppkey").asc)
        ps.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .join(broadcast(Tables.supplier(s, d)
            .select("s_suppkey", "s_name", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("p_partkey"), col("p_brand"), col("s_name"),
            col("n_name"), col("avgp").as("min_avg_price"))
          .orderBy("p_partkey")
      },
      s"""WITH p AS (
           SELECT p_partkey, p_brand FROM part
           WHERE p_type = 'LARGE' AND p_size <= 10),
         ps AS (
           SELECT p_partkey, p_brand, l_suppkey,
             sum(${centsSql("l_extendedprice")}) AS sumc, count(*) AS cnt
           FROM lineitem JOIN p ON l_partkey = p_partkey
           GROUP BY 1, 2, 3),
         r AS (
           SELECT *, sumc::DOUBLE / cnt::DOUBLE / 100 AS avgp,
             row_number() OVER (PARTITION BY p_partkey
               ORDER BY sumc::DOUBLE / cnt::DOUBLE / 100 ASC, l_suppkey ASC) AS rn
           FROM ps)
         SELECT p_partkey, p_brand, s_name, n_name, avgp AS min_avg_price
         FROM r JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
         WHERE rn = 1 ORDER BY p_partkey"""),

    // TPC-H Q21 shape — suppliers who kept orders waiting: R-flagged
    // lines from one nation's suppliers, in multi-supplier orders where
    // NO other supplier also flagged R (the corpus lacks commit/receipt
    // dates, so returnflag stands in for "late"). The double-correlated
    // EXISTS / NOT EXISTS compiles to one LEFT SEMI + one LEFT ANTI
    // self-join, both equi-keyed on l_orderkey with the supplier
    // inequality as a residual — co-partitioned shuffles, no nested
    // loop. The nation's supplier slice broadcasts and pre-filters the
    // probe BEFORE the self-joins, so both big joins see only the
    // R-slice of one nation on the left.
    QueryDef("q_tpch_waiting",
      (s, d) => {
        val l = Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_returnflag")
        val supp = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name")
        val l1 = l.filter(col("l_returnflag") === "R")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        val others = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        val othersR = l.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
        l1.join(others,
            col("o2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
            "left_semi")
          .join(othersR,
            col("o3") === col("l_orderkey") && col("s3") =!= col("l_suppkey"),
            "left_anti")
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey").asc)
          .limit(100)
      },
      """SELECT s_suppkey, s_name, count(*) AS numwait
         FROM lineitem l1
           JOIN supplier ON l1.l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_3' AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey
               AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
             WHERE l3.l_orderkey = l1.l_orderkey
               AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_returnflag = 'R')
         GROUP BY s_suppkey, s_name
         ORDER BY numwait DESC, s_suppkey ASC
         LIMIT 100"""),

    // TPC-H Q9 shape — product-type profit by nation and year, adapted:
    // profit = Σ price·(1−disc) − retailprice·qty over '%red%' parts
    // (p_retailprice stands in for the absent ps_supplycost; both terms
    // land on the same cents² integer scale, so the whole measure is
    // exact BIGINT until one final /1e4). Plan shape: the part slice
    // and supplier→nation are broadcast dimension legs; lineitem⋈orders
    // is the one fact shuffle; year() is a projection. The p_name
    // filter prunes the fact join via the broadcast hash-set — at
    // 100 TB a bloom/DPP runtime filter does the same job on the scan.
    QueryDef("q_tpch_profit",
      (s, d) => {
        val p = Tables.part(s, d).filter(col("p_name").like("%red%"))
          .select(col("p_partkey"),
            cents(col("p_retailprice")).as("costc"))
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            revC().as("revc2"), cents(col("l_quantity")).as("qtyc"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), col("o_year"))
          .agg(sum(col("revc2") - col("costc") * col("qtyc")).as("profc2"),
            count(lit(1)).as("n_lines"))
          .select(col("nation"), col("o_year"),
            (col("profc2").cast("double") / 1e4).as("sum_profit"),
            col("n_lines"))
          .orderBy(col("nation").asc, col("o_year").desc)
      },
      s"""SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
           sum($revSql - ${centsSql("p_retailprice")} * ${centsSql("l_quantity")})::DOUBLE
             / 1e4 AS sum_profit,
           count(*) AS n_lines
         FROM lineitem
           JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC"""),
  )
}
