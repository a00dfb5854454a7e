package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables

/** Classic TPC-H-shape analytics over the synthetic warehouse tables —
  * the multi-join aggregate workload a "complete engine" claim has to
  * carry end-to-end (scan → selective filters → dimension joins →
  * grouped money math → top-k), exercised as ONE pipeline per query
  * rather than the per-operator micro-queries elsewhere in the registry.
  *
  * Money math runs in integer CENTS: sources are 2-decimal quantities
  * stored as doubles, so `floor(x·100 + 0.5)` recovers the exact cent
  * value (the double sits within ~1e-9 of it, and both engines share
  * IEEE multiply/add/floor bit-for-bit), products like
  * price·(100−disc)·(100+tax) stay exact BIGINT arithmetic in any
  * aggregation order, and one final double division scales back. This
  * sidesteps both DECIMAL-cast tie rounding on computed doubles (the
  * engines' double→DECIMAL paths differ by one scale-ulp) and the
  * DECIMAL→DOUBLE 2^53 scaled-sum limit (BIGINT→DOUBLE is uniform
  * IEEE nearest in both engines at any magnitude).
  */
object Relational4 {

  /** Exact cent count of a 2-decimal quantity stored as double. */
  private def cents(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")
  private def centsSql(c: String): String =
    s"floor($c * 100 + 0.5)::BIGINT"

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape — pricing summary report: one full scan, no joins,
    // eight aggregates per (returnflag, linestatus) including the
    // discounted and taxed money columns. Pure map-side-combine
    // aggregation: the shuffle carries 6 groups × 8 partials no matter
    // the corpus size; the scan prunes to the 7 referenced columns and
    // the shipdate predicate pushes into parquet.
    QueryDef("q_tpch_pricing",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sq"),
          sum(cents(col("l_extendedprice"))).as("sb"),
          sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("sd"),
          sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
            * (lit(100) + cents(col("l_tax")))).as("sc"),
          sum(cents(col("l_discount"))).as("sdisc"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("sq").cast("double") / 100).as("sum_qty"),
          (col("sb").cast("double") / 100).as("sum_base_price"),
          (col("sd").cast("double") / 1e4).as("sum_disc_price"),
          (col("sc").cast("double") / 1e6).as("sum_charge"),
          ((col("sq").cast("double") / 100) / col("count_order")).as("avg_qty"),
          ((col("sb").cast("double") / 100) / col("count_order")).as("avg_price"),
          ((col("sdisc").cast("double") / 100) / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      s"""SELECT l_returnflag, l_linestatus,
           sum(${centsSql("l_quantity")})::DOUBLE / 100 AS sum_qty,
           sum(${centsSql("l_extendedprice")})::DOUBLE / 100 AS sum_base_price,
           sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}))::DOUBLE / 1e4 AS sum_disc_price,
           sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
             * (100 + ${centsSql("l_tax")}))::DOUBLE / 1e6 AS sum_charge,
           (sum(${centsSql("l_quantity")})::DOUBLE / 100) / count(*) AS avg_qty,
           (sum(${centsSql("l_extendedprice")})::DOUBLE / 100) / count(*) AS avg_price,
           (sum(${centsSql("l_discount")})::DOUBLE / 100) / count(*) AS avg_disc,
           count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""),

    // TPC-H Q3 shape — shipping priority: the classic customer ⋈ orders
    // ⋈ lineitem funnel with date predicates on both fact sides, top-10
    // unshipped orders by revenue. The segment-filtered customer side is
    // keys-only and AQE-broadcastable; revenue aggregates per order
    // BEFORE the top-k, so the sort sees one row per order, not per
    // line item; TakeOrdered(10) never materializes a global sort.
    QueryDef("q_tpch_shipping",
      (s, d) => {
        val cut = lit("1998-07-01").cast("timestamp")
        val c = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
          .select(col("l_orderkey"),
            (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
              .as("rev"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(col("rev")).as("revc"))
          .select(col("l_orderkey"),
            (col("revc").cast("double") / 1e4).as("revenue"),
            col("o_orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("o_orderdate").asc,
            col("l_orderkey").asc)
          .limit(10)
      },
      s"""SELECT l_orderkey,
           sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}))::DOUBLE / 1e4 AS revenue,
           o_orderdate, o_orderpriority
         FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-07-01'
           AND l_shipdate > TIMESTAMP '1998-07-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
         LIMIT 10"""),

    // TPC-H Q5 shape — local supplier volume: the six-table star join
    // (region → nation → customer/supplier → orders → lineitem) with the
    // local-supply predicate c_nationkey = s_nationkey, revenue per
    // nation. region/nation broadcast (25 rows); the fact joins shuffle
    // on their natural keys; revenue in exact cents.
    QueryDef("q_tpch_localsupp",
      (s, d) => {
        val n = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
          (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            .as("rev"))
        val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(col("rev")).as("revc"))
          .select(col("n_name"), (col("revc").cast("double") / 1e4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      s"""SELECT n_name,
           sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}))::DOUBLE / 1e4 AS revenue
         FROM region JOIN nation ON n_regionkey = r_regionkey
           JOIN supplier ON s_nationkey = n_nationkey
           JOIN customer ON c_nationkey = s_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name ASC"""),

    // TPC-H Q10 shape — returned-item reporting: which customers
    // returned the most revenue in a quarter. Fact-side filters first
    // (returnflag + order quarter), revenue per customer, top 20 —
    // the rank sees one row per customer, the money math stays integer.
    QueryDef("q_tpch_returns",
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-04-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val l = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
              .as("rev"))
        val c = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(sum(col("rev")).as("revc"))
          .select(col("c_custkey"), col("c_name"),
            (col("revc").cast("double") / 1e4).as("revenue"),
            col("c_acctbal"), col("n_name"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      s"""SELECT c_custkey, c_name,
           sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}))::DOUBLE / 1e4 AS revenue,
           c_acctbal, n_name
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1999-01-01'
           AND o_orderdate < TIMESTAMP '1999-04-01'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey ASC
         LIMIT 20"""),

    // TPC-H Q12 shape — priority mix per return class: one fact-dim
    // equi-join, then CONDITIONAL aggregation (sum-of-CASE) splitting
    // each group's line count by order priority — the classic
    // pivot-without-pivot report. Map-side combine ships 3 groups × 2
    // counters; the join key prunes to 2 fact columns + the date filter
    // pushes to parquet. (The synthetic schema has no l_shipmode; the
    // returnflag plays the grouping role, priorities the CASE split.)
    QueryDef("q_tpch_priority",
      (s, d) => {
        val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val l = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp"))
          .select("l_orderkey", "l_returnflag")
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1999-01-01'
         GROUP BY l_returnflag
         ORDER BY l_returnflag"""),

    // Z-order data layout — the OPTIMIZE ZORDER step lakehouse tables run
    // so that scans filtered on EITHER (or both) of two keys prune most
    // files: each key is range-bucketed to 4 bits, the bits interleave
    // into an 8-bit z-value, rows sort by it, and the sorted run splits
    // into 64 equal files. The output is the layout's pruning manifest —
    // per-file min/max of both keys (exactly what a format's file-skipping
    // index stores); z-ordering bounds BOTH spans per file, where a
    // single-key sort leaves the other key's span at full width. The
    // file assignment is the SHARDED rank (ops/Sharded): zval (256
    // values) is the leading sort key, so within-shard partitioned
    // row_numbers plus a 256-row prefix-sum of shard counts reproduce
    // the global rank exactly with no single-task sort — the oracle
    // keeps the plain global window, pinning the rewrite exact.
    // All math is integer (buckets, shifts, div) so both engines agree
    // bit-for-bit; the sort key is padded to a unique total order because
    // synthetic (l_orderkey, l_linenumber) is not unique.
    QueryDef("q_layout_zorder",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        val m = broadcast(li.agg(
          max("l_partkey").as("mp"), max("l_suppkey").as("ms"),
          count(lit(1)).as("n")))
        val zipped = li.crossJoin(m)
          .withColumn("x", expr("((l_partkey - 1) * 16) div mp"))
          .withColumn("y", expr("((l_suppkey - 1) * 16) div ms"))
          .withColumn("zval", expr(
            """shiftleft((x       & 1), 0) + shiftleft((y       & 1), 1) +
               shiftleft((shiftright(x, 1) & 1), 2) + shiftleft((shiftright(y, 1) & 1), 3) +
               shiftleft((shiftright(x, 2) & 1), 4) + shiftleft((shiftright(y, 2) & 1), 5) +
               shiftleft((shiftright(x, 3) & 1), 6) + shiftleft((shiftright(y, 3) & 1), 7)"""))
        graft.ops.Sharded.globalRowNumber(zipped, col("zval"),
            Seq(col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey")), "rn1")
          .withColumn("rn", col("rn1") - 1)
          .withColumn("file_id", expr("rn div ((n + 63) div 64)"))
          .groupBy("file_id")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            min("l_partkey").cast("long").as("part_min"),
            max("l_partkey").cast("long").as("part_max"),
            min("l_suppkey").cast("long").as("supp_min"),
            max("l_suppkey").cast("long").as("supp_max"))
          .withColumn("file_id", col("file_id").cast("long"))
          .orderBy("file_id")
      },
      """WITH m AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms,
                           count(*) AS n FROM lineitem),
         b AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, n,
                 ((l_partkey - 1) * 16) // mp AS x,
                 ((l_suppkey - 1) * 16) // ms AS y
               FROM lineitem, m),
         z AS (SELECT *,
                 ((x & 1) << 0) + ((y & 1) << 1) +
                 (((x >> 1) & 1) << 2) + (((y >> 1) & 1) << 3) +
                 (((x >> 2) & 1) << 4) + (((y >> 2) & 1) << 5) +
                 (((x >> 3) & 1) << 6) + (((y >> 3) & 1) << 7) AS zval
               FROM b),
         r AS (SELECT *,
                 (row_number() OVER (ORDER BY zval, l_orderkey, l_linenumber,
                                     l_partkey, l_suppkey) - 1)
                   // ((n + 63) // 64) AS file_id
               FROM z)
         SELECT file_id::BIGINT AS file_id, count(*)::BIGINT AS n_rows,
           min(l_partkey)::BIGINT AS part_min, max(l_partkey)::BIGINT AS part_max,
           min(l_suppkey)::BIGINT AS supp_min, max(l_suppkey)::BIGINT AS supp_max
         FROM r GROUP BY file_id ORDER BY file_id"""),

    // Distribution-rank window trio — ntile (equal-height bucketing,
    // the quantile-assignment step behind quality-band curricula and
    // per-segment tiering), percent_rank, and cume_dist, all over ONE
    // (segment, balance) sort. Determinism: the order key ends in the
    // unique c_custkey so ranks are strict; percent_rank = (rank−1)/(n−1)
    // and cume_dist = rank/n are then single IEEE divisions of exact
    // integers — bit-identical across engines. Scale shape: one shuffle
    // on the partition key, one sort within; all three functions share
    // the frame (no second exchange), and segment cardinality bounds
    // task state.
    QueryDef("q_window_ntile",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_mktsegment, c_acctbal,
           (ntile(4) OVER w)::BIGINT AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey ASC)
         ORDER BY c_custkey"""),

    // TPC-H Q7 shape — bilateral shipping volume: revenue flowing
    // between two named nations (either direction), broken out by
    // supplier nation / customer nation / ship year. Exercises the
    // two-path dimension join (the same nation table joined through
    // supplier AND through customer⋈orders) plus a disjunctive
    // cross-dimension predicate. Both nation legs broadcast (25 rows →
    // customer/supplier), the fact joins shuffle on their natural keys,
    // revenue in exact cents (integer-BIGINT-sum deterministic).
    QueryDef("q_tpch_natvolume",
      (s, d) => {
        val nats = Seq("NATION_12", "NATION_13")
        val n = Tables.nation(s, d).filter(col("n_name").isin(nats: _*))
          .select("n_nationkey", "n_name")
        val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
          .join(broadcast(n.select(col("n_nationkey"),
            col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(n.select(col("n_nationkey"),
            col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "cust_nation")
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("ship_year"),
            (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
              .as("rev"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy("supp_nation", "cust_nation", "ship_year")
          .agg((sum("rev").cast("double") / 1e4).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("supp_nation", "cust_nation", "ship_year")
      },
      s"""SELECT supp_nation, cust_nation, ship_year,
           sum(rev)::DOUBLE / 1e4 AS revenue, count(*) AS n_items
         FROM (
           SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             year(l_shipdate)::BIGINT AS ship_year,
             ${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}) AS rev
           FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation sn ON s_nationkey = sn.n_nationkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation cn ON c_nationkey = cn.n_nationkey
           WHERE sn.n_name IN ('NATION_12', 'NATION_13')
             AND cn.n_name IN ('NATION_12', 'NATION_13')
             AND sn.n_name <> cn.n_name) v
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),

    // Small-file compaction planning (the q_layout_zorder companion):
    // treat each document as a file of n_chars bytes within its source
    // partition and assign merge groups by EXCLUSIVE running size over
    // a 4 KiB target — the greedy size-binning every table-format
    // compactor (Iceberg binpack, Delta OPTIMIZE) runs before rewriting.
    // One window cumsum per source partition (keyed shuffle, exact
    // BIGINT), then a per-group rollup; output is plan-sized (one row
    // per target file), not input-sized.
    QueryDef("q_layout_compaction",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val target = 4096L
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("before", coalesce(sum(col("n_chars")).over(w), lit(0L)))
          .withColumn("grp", (col("before") / target).cast("long"))
          .groupBy("source", "grp")
          .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("source", "grp")
      },
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM documents)
        |SELECT source, (before // 4096)::BIGINT AS grp,
        |  count(*) AS n_files, sum(n_chars)::BIGINT AS bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY source, (before // 4096)::BIGINT
        |ORDER BY source, grp""".stripMargin),

    // Zone-map pruning effectiveness — the quantified argument for
    // clustering data by its hottest filter key. Rows are binned into
    // 256 simulated files under two layouts: HASH (orderkey mod 256 —
    // the "insertion order" analog, every file spans the whole
    // shipdate range) and RANGE (shipdate epoch-day range-bucketed —
    // what repartitionByRange + sortWithinPartitions produces). Each
    // file keeps a (min, max) shipdate zone map; a representative
    // 90-day predicate then counts how many files survive min/max
    // pruning and how many rows those files hold. NO global windows:
    // file ids derive arithmetically from the row's own key (mod /
    // range-scaled day), so the whole simulation is two map-side-
    // combined groupBys — the same trick lets a real 100 TB layout
    // job skip the global row_number a naive rows-per-file split
    // would need.
    QueryDef("q_layout_zonemap",
      (s, d) => {
        val day = datediff(col("l_shipdate"), lit("1970-01-01").cast("date"))
          .cast("long")
        val li = Tables.lineitem(s, d).select(day.as("day"))
        val span = li.groupBy().agg(min("day").as("d0"), max("day").as("d1"))
        val binned = Tables.lineitem(s, d)
          .select(col("l_orderkey"), day.as("day"))
          .crossJoin(broadcast(span))
          .select(col("day"),
            (col("l_orderkey") % 256).as("f_hash"),
            expr("(day - d0) * 256 div (d1 - d0 + 1)").as("f_range"),
            col("d0"))
        // predicate: the 90 days starting one year into the span
        val files = binned
          .select(explode(array(
            struct(lit("hash").as("layout"), col("f_hash").as("f")),
            struct(lit("range").as("layout"), col("f_range").as("f"))))
            .as("lf"), col("day"), col("d0"))
          .select(col("lf.layout").as("layout"), col("lf.f").as("f"),
            col("day"), (col("d0") + 365).as("p_lo"), (col("d0") + 455).as("p_hi"))
          .groupBy("layout", "f", "p_lo", "p_hi")
          .agg(min("day").as("zmin"), max("day").as("zmax"),
            count(lit(1)).as("nrows"))
        files.groupBy("layout")
          .agg(count(lit(1)).cast("long").as("n_files"),
            sum("nrows").as("n_rows"),
            sum(when(col("zmax") >= col("p_lo") && col("zmin") <= col("p_hi"),
              1L).otherwise(0L)).as("files_scanned"),
            sum(when(col("zmax") >= col("p_lo") && col("zmin") <= col("p_hi"),
              col("nrows")).otherwise(0L)).as("rows_scanned"))
          .select(col("layout"), col("n_files"), col("files_scanned"),
            (col("files_scanned").cast("double") /
              col("n_files").cast("double")).as("files_frac"),
            (col("rows_scanned").cast("double") /
              col("n_rows").cast("double")).as("rows_frac"))
          .orderBy("layout")
      },
      """WITH li AS (
        |  SELECT l_orderkey,
        |    date_diff('day', DATE '1970-01-01', l_shipdate::DATE)::BIGINT AS day
        |  FROM lineitem),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM li),
        |binned AS (
        |  SELECT day, l_orderkey % 256 AS f_hash,
        |    (day - d0) * 256 // (d1 - d0 + 1) AS f_range,
        |    d0 + 365 AS p_lo, d0 + 455 AS p_hi
        |  FROM li CROSS JOIN span),
        |lays AS (
        |  SELECT 'hash' AS layout, f_hash AS f, day, p_lo, p_hi FROM binned
        |  UNION ALL
        |  SELECT 'range' AS layout, f_range AS f, day, p_lo, p_hi FROM binned),
        |files AS (
        |  SELECT layout, f, p_lo, p_hi, min(day) AS zmin, max(day) AS zmax,
        |    count(*) AS nrows
        |  FROM lays GROUP BY 1, 2, 3, 4)
        |SELECT layout, count(*)::BIGINT AS n_files,
        |  sum(CASE WHEN zmax >= p_lo AND zmin <= p_hi THEN 1 ELSE 0 END)::BIGINT
        |    AS files_scanned,
        |  sum(CASE WHEN zmax >= p_lo AND zmin <= p_hi THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*)::DOUBLE AS files_frac,
        |  sum(CASE WHEN zmax >= p_lo AND zmin <= p_hi THEN nrows ELSE 0 END)::DOUBLE
        |    / sum(nrows)::DOUBLE AS rows_frac
        |FROM files GROUP BY layout ORDER BY layout""".stripMargin),
  )
}
