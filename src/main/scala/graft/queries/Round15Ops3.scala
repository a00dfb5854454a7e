package graft.queries

import graft.Tables

/** Round-15 batch 3: the rest of the SQL-grammar grouping tail —
  * ROLLUP and CUBE through BOTH engines' native parsers (the
  * q_sql_groupingsets discipline: DataFrame twins q_agg_rollup /
  * q_agg_cube proved the aggregation in round 1-2; these prove the
  * grammar + grouping-resolution path, with grouping() flags
  * disambiguating rolled-up NULLs on both sides).
  */
object Round15Ops3 {

  private val rollupStmt = (table: String) => s"""
    SELECT coalesce(l_returnflag, '(all)') AS rflag,
           coalesce(l_linestatus, '(all)') AS lstatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM $table
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, rflag, lstatus"""

  private val cubeStmt = (table: String) => s"""
    SELECT coalesce(l_returnflag, '(all)') AS rflag,
           coalesce(l_linestatus, '(all)') AS lstatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM $table
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, rflag, lstatus"""

  val defs: Seq[QueryDef] = Seq(

    // GROUP BY ROLLUP through both native grammars — hierarchy
    // subtotals (flag, flag+status, grand total), the statement text
    // identical on both sides modulo the view name.
    //
    // Scale shape: one scan + Expand(3) + map-side-combined hash
    // aggregate (Spark plans rollup exactly like explicit grouping
    // sets); output bounded by key combinations.
    QueryDef("q_sql_rollup",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q15r")
        s.sql(rollupStmt("lineitem_q15r"))
      },
      rollupStmt("lineitem")),

    // GROUP BY CUBE — all four granularities; same discipline.
    //
    // Scale shape: one scan + Expand(4) + map-side-combined hash
    // aggregate; output bounded by key combinations.
    QueryDef("q_sql_cube",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q15c")
        s.sql(cubeStmt("lineitem_q15c"))
      },
      cubeStmt("lineitem")))
}
