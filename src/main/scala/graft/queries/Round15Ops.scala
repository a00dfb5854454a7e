package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-15 batch 1: the SQL-grammar long tail, run through BOTH
  * engines' native parsers with the same statement semantics (the
  * q_sql_qualify / q_sql_groupbyall cross-engine discipline) — multi-
  * granularity GROUPING SETS with grouping() disambiguation, bag-
  * semantics EXCEPT ALL / INTERSECT ALL, and the strict-cardinality
  * MERGE variant (real MERGE throws on duplicate source matches;
  * `spark.sql.graft.merge.strictCardinality` turns the r14 preview's
  * documented divergence into the ANSI behavior — see
  * plans/MergePreview.scala).
  */
object Round15Ops {

  val defs: Seq[QueryDef] = Seq(

    // GROUPING SETS through both native grammars — the DataFrame twin
    // (q_agg_groupingsets) proved the aggregation; this proves the
    // PARSER + grouping-resolution path: four explicit granularities in
    // one pass, with single-argument grouping() flags telling a rolled-
    // up NULL from a data NULL (the one thing COALESCE alone cannot).
    // Flags are cast to BIGINT on both sides (Spark emits TINYINT,
    // DuckDB INT64).
    //
    // Scale shape: Spark plans grouping sets as ONE scan + Expand(4) +
    // map-side-combined hash aggregate — no re-scan per granularity;
    // the output is bounded by the key-combination count.
    QueryDef("q_sql_groupingsets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q15gs")
        s.sql("""
          SELECT coalesce(l_returnflag, '(all)') AS rflag,
                 coalesce(l_linestatus, '(all)') AS lstatus,
                 CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                 CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem_q15gs
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                  (l_returnflag), (l_linestatus), ())
          ORDER BY g_rf, g_ls, rflag, lstatus""")
      },
      """SELECT coalesce(l_returnflag, '(all)') AS rflag,
        |       coalesce(l_linestatus, '(all)') AS lstatus,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, rflag, lstatus""".stripMargin),

    // EXCEPT ALL through both native grammars — bag semantics the
    // DataFrame twin (q_except_all) already proved; here the statement
    // parses on both engines. "Order multiplicity a customer had in
    // 1995 beyond their 1996 multiplicity": EXCEPT ALL keeps
    // max(m1995 − m1996, 0) copies per key, and the wrapping count
    // re-reads that multiplicity so the gate checks the BAG, not the
    // distinct set, while bounding the output at one row per customer.
    //
    // Scale shape: Spark compiles EXCEPT ALL to per-side counted
    // aggregates + a sum/generate replication — two map-side-combined
    // aggregates on the key, no join of the raw bags; the outer count
    // folds into the same shuffle key.
    QueryDef("q_sql_exceptall",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q15ea")
        s.sql("""
          SELECT k, CAST(count(*) AS BIGINT) AS mult
          FROM (
            SELECT CAST(o_custkey AS BIGINT) AS k FROM orders_q15ea
            WHERE year(o_orderdate) = 1995
            EXCEPT ALL
            SELECT CAST(o_custkey AS BIGINT) FROM orders_q15ea
            WHERE year(o_orderdate) = 1996
          ) t
          GROUP BY k ORDER BY k""")
      },
      """SELECT k, CAST(count(*) AS BIGINT) AS mult
        |FROM (
        |  SELECT CAST(o_custkey AS BIGINT) AS k FROM orders
        |  WHERE year(o_orderdate) = 1995
        |  EXCEPT ALL
        |  SELECT CAST(o_custkey AS BIGINT) FROM orders
        |  WHERE year(o_orderdate) = 1996
        |) t
        |GROUP BY k ORDER BY k""".stripMargin),

    // INTERSECT ALL — the other bag operator: min(m1997, m1998) copies
    // per customer ("repeat-order multiplicity sustained across both
    // years"), same wrap-and-count gate shape as q_sql_exceptall.
    //
    // Scale shape: same counted-aggregate compilation — two shuffles on
    // the key, least() of the counts, generate — never a bag join.
    QueryDef("q_sql_intersectall",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q15ia")
        s.sql("""
          SELECT k, CAST(count(*) AS BIGINT) AS mult
          FROM (
            SELECT CAST(o_custkey AS BIGINT) AS k FROM orders_q15ia
            WHERE year(o_orderdate) = 1997
            INTERSECT ALL
            SELECT CAST(o_custkey AS BIGINT) FROM orders_q15ia
            WHERE year(o_orderdate) = 1998
          ) t
          GROUP BY k ORDER BY k""")
      },
      """SELECT k, CAST(count(*) AS BIGINT) AS mult
        |FROM (
        |  SELECT CAST(o_custkey AS BIGINT) AS k FROM orders
        |  WHERE year(o_orderdate) = 1997
        |  INTERSECT ALL
        |  SELECT CAST(o_custkey AS BIGINT) FROM orders
        |  WHERE year(o_orderdate) = 1998
        |) t
        |GROUP BY k ORDER BY k""".stripMargin),

    // MERGE INTO under strict cardinality — q_sql_merge's scenario
    // with a CONDITIONAL update (only batches of ≥2 new orders fold in)
    // run through the validating plan: each target row carries a row
    // id, a window count over the id measures its ON-clause match
    // multiplicity, and assert_true raises GRAFT_MERGE_CARDINALITY on
    // any multiplicity > 1 (the ANSI behavior; Round15Spec pins the
    // throwing path with a duplicate-key source). Here the source is
    // an aggregate on the merge key, so the guard passes and the
    // result must equal the desugared LEFT JOIN + NOT EXISTS oracle —
    // proving the guard is output-neutral on valid input.
    //
    // Scale shape: the two merge joins of q_sql_merge plus ONE extra
    // hash-partition pass keyed on the unique row id for the window
    // count (partition-only, no sort) — the documented price of the
    // cardinality check, paid only when the conf is on.
    QueryDef("q_sql_merge_strict",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(year(col("o_orderdate")) < 1997)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
          .createOrReplaceTempView("merge_tgt_q15")
        o.filter(year(col("o_orderdate")) >= 1997)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
          .createOrReplaceTempView("merge_src_q15")
        val prev = s.conf.getOption("spark.sql.graft.merge.strictCardinality")
        s.conf.set("spark.sql.graft.merge.strictCardinality", "true")
        try {
          val merged = s.sql("""
            MERGE INTO merge_tgt_q15 t
            USING merge_src_q15 s
            ON t.o_custkey = s.o_custkey
            WHEN MATCHED AND s.cnt >= 2 THEN
              UPDATE SET cnt = t.cnt + s.cnt, total = t.total + s.total
            WHEN NOT MATCHED THEN INSERT (o_custkey, cnt, total)
                                  VALUES (s.o_custkey, s.cnt, s.total)""")
          // Pin the two assumptions the toggle-and-restore depends on
          // (r15 ADVICE): MergePreviewRule is a RESOLUTION rule and
          // sql() analyzes eagerly, so by this line the strict plan is
          // already baked in — assert it by looking for the guard's
          // row-id in the analyzed plan, so a future move of the rule
          // to the optimizer (or a lazily-analyzed path) fails LOUDLY
          // here instead of silently running the non-strict plan.
          require(merged.queryExecution.analyzed.toString.contains("__graft_rid"),
            "strictCardinality was set but the analyzed MERGE plan has no " +
              "cardinality guard — MergePreviewRule no longer runs at analysis")
          merged
            .select(col("o_custkey"), col("cnt").cast("long").as("cnt"),
              col("total").cast("double").as("total"))
            .orderBy("o_custkey")
        } finally {
          // sql() analyzes eagerly, so the strict plan is already baked in
          prev match {
            case Some(v) => s.conf.set("spark.sql.graft.merge.strictCardinality", v)
            case None => s.conf.unset("spark.sql.graft.merge.strictCardinality")
          }
        }
      },
      """WITH tgt AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt,
        |         sum(o_totalprice::DECIMAL(18,2)) AS total
        |  FROM orders WHERE year(o_orderdate) < 1997 GROUP BY 1),
        |src AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt,
        |         sum(o_totalprice::DECIMAL(18,2)) AS total
        |  FROM orders WHERE year(o_orderdate) >= 1997 GROUP BY 1),
        |merged AS (
        |  SELECT t.o_custkey,
        |         CASE WHEN s.o_custkey IS NOT NULL AND s.cnt >= 2
        |              THEN t.cnt + s.cnt ELSE t.cnt END AS cnt,
        |         CASE WHEN s.o_custkey IS NOT NULL AND s.cnt >= 2
        |              THEN t.total + s.total ELSE t.total END AS total
        |  FROM tgt t LEFT JOIN src s ON t.o_custkey = s.o_custkey
        |  UNION ALL
        |  SELECT s.o_custkey, s.cnt, s.total
        |  FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_custkey = s.o_custkey))
        |SELECT o_custkey, cnt::BIGINT AS cnt, CAST(total AS DOUBLE) AS total
        |FROM merged ORDER BY o_custkey""".stripMargin))
}
