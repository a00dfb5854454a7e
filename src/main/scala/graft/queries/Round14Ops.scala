package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 batch 1: the SQL-frontend long tail the round-13 verdict
  * left open — UNPIVOT through BOTH grammars (Spark 4.1 and DuckDB both
  * implement the SQL-standard `FROM t UNPIVOT (val FOR name IN (...))`
  * table clause, so the oracle runs the semantically identical text
  * natively — the q_sql_qualify cross-engine discipline) and MERGE INTO
  * through the engine's analyzer extension
  * ([[graft.plans.MergePreviewRule]]: Spark parses MERGE natively but
  * only executes it against row-level-operation catalogs; the injected
  * resolution rule rewrites a resolved MergeIntoTable over temp views
  * into its read-side post-merge preview — LEFT JOIN update branch +
  * ANTI JOIN insert branch + UNION — which the DuckDB oracle expresses
  * as the equivalent SELECT). The DataFrame twins (q_unpivot,
  * q_merge_upsert) have been green since rounds 4/9; these two close
  * the analyst-facing GRAMMAR paths.
  */
object Round14Ops {

  val defs: Seq[QueryDef] = Seq(

    // SQL-grammar UNPIVOT: yearly order-status counts spread wide by a
    // conditional aggregate, then folded back to long form through the
    // standard UNPIVOT table clause — the wide→long reshape analysts
    // reach for when a pivoted extract has to feed a long-format model.
    // Both engines run their NATIVE standard-syntax UNPIVOT over the
    // same wide frame, so label generation (`metric` takes the source
    // COLUMN NAME) and NULL-drop semantics (both engines exclude NULL
    // cells by default; the counts here are never NULL so the default
    // is exercised but not load-bearing) are cross-checked directly.
    //
    // Scale shape: UNPIVOT compiles to Expand — |metrics|× row
    // multiplication AFTER the aggregate, over |years| rows, not over
    // the fact table; the only shuffle is the year groupBy (map-side
    // combined).
    QueryDef("q_sql_unpivot",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q14u")
        s.sql("""
          SELECT yr, metric, val FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(count(*) AS BIGINT) AS cnt_all,
                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
                   CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p
            FROM orders_q14u GROUP BY year(o_orderdate))
          UNPIVOT (val FOR metric IN (cnt_all, cnt_o, cnt_f, cnt_p))
          ORDER BY yr, metric""")
      },
      """SELECT yr, metric, val FROM (
        |  SELECT year(o_orderdate)::BIGINT AS yr,
        |         count(*)::BIGINT AS cnt_all,
        |         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS cnt_o,
        |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS cnt_f,
        |         sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS cnt_p
        |  FROM orders GROUP BY year(o_orderdate))
        |UNPIVOT (val FOR metric IN (cnt_all, cnt_o, cnt_f, cnt_p))
        |ORDER BY yr, metric""".stripMargin),

    // MERGE INTO through the frontend: the standing per-customer order
    // summary (orders before 1997) upserted with the 1997+ batch —
    // matched customers accumulate counts/totals, new customers insert.
    // The statement is genuine MERGE grammar through spark.sql();
    // MergePreviewRule (injectResolutionRule) turns the resolved
    // command into the post-merge result set. Totals accumulate in
    // DECIMAL (exact under any partial-agg order) and cast to DOUBLE
    // only in the final projection; the oracle is the desugar's
    // definition written out (LEFT JOIN + NOT EXISTS UNION) — a
    // semantics bug in the rule (wrong match indicator, wrong
    // unassigned-column handling, inserted rows leaking into the
    // update branch) hash-fails.
    //
    // Scale shape: two equi-join shuffles on the merge key (update +
    // anti branch; AQE broadcasts the smaller side) over frames already
    // reduced by the groupBys — no window, no global sort before the
    // final presentation ORDER BY.
    QueryDef("q_sql_merge",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(year(col("o_orderdate")) < 1997)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
          .createOrReplaceTempView("merge_tgt_q14")
        o.filter(year(col("o_orderdate")) >= 1997)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
          .createOrReplaceTempView("merge_src_q14")
        s.sql("""
          MERGE INTO merge_tgt_q14 t
          USING merge_src_q14 s
          ON t.o_custkey = s.o_custkey
          WHEN MATCHED THEN UPDATE SET cnt = t.cnt + s.cnt,
                                       total = t.total + s.total
          WHEN NOT MATCHED THEN INSERT (o_custkey, cnt, total)
                                VALUES (s.o_custkey, s.cnt, s.total)""")
          .select(col("o_custkey"), col("cnt").cast("long").as("cnt"),
            col("total").cast("double").as("total"))
          .orderBy("o_custkey")
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
        |         CASE WHEN s.o_custkey IS NOT NULL
        |              THEN t.cnt + s.cnt ELSE t.cnt END AS cnt,
        |         CASE WHEN s.o_custkey IS NOT NULL
        |              THEN t.total + s.total ELSE t.total END AS total
        |  FROM tgt t LEFT JOIN src s ON t.o_custkey = s.o_custkey
        |  UNION ALL
        |  SELECT s.o_custkey, s.cnt, s.total
        |  FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_custkey = s.o_custkey))
        |SELECT o_custkey, cnt::BIGINT AS cnt, CAST(total AS DOUBLE) AS total
        |FROM merged ORDER BY o_custkey""".stripMargin))
}
