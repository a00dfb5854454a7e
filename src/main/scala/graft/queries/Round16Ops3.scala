package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-16 batch 3: the WRITABLE session-catalog surface — CTAS,
  * INSERT INTO, and MERGE-EXECUTE over managed parquet tables
  * (spark-warehouse). The engine's storage story so far was read-side
  * (parquet scans, JDBC append, the MERGE preview); these queries close
  * the loop a warehouse user expects: create a table from a query, top
  * it up incrementally, upsert into it — then READ BACK what landed on
  * disk, so the gate hashes the round-tripped bytes, not the dataflow
  * that produced them.
  *
  * Re-runnability (Bench runs every query ≥3×, Verify once per SF):
  * each run DROPs and recreates its tables — names are namespaced
  * q16_* so nothing else collides. Determinism: the written content is
  * a deterministic aggregate; parquet round-trips it exactly; output
  * ORDER BY is a unique key.
  *
  * Scale note: CTAS/INSERT INTO over parquet are Spark's native
  * distributed writers (per-partition files, no driver funnel);
  * MERGE-execute rewrites the target in full — the documented price of
  * row-level ops on parquet (see [[graft.ops.Merge.executeInto]]).
  */
object Round16Ops3 {

  /** DROP a managed table AND its warehouse location. The session
    * catalog is ephemeral (in-memory per JVM) but spark-warehouse is
    * not: a table created by a previous session leaves its directory
    * behind, DROP IF EXISTS no-ops (the new catalog never heard of
    * it), and the next CTAS dies with LOCATION_ALREADY_EXISTS. Every
    * q16_* query starts from this, so reruns are clean in ANY session
    * (shared with the round-17 writable-catalog queries). */
  private[graft] def dropManaged(s: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(name)))
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  val defs: Seq[QueryDef] = Seq(

    // CTAS + INSERT INTO round-trip: the pre-1997 per-customer order
    // rollup lands via CREATE TABLE AS, the 1997+ tail via INSERT INTO
    // (tagged by period so the insert is visible in the output), and
    // the result is read back FROM THE TABLE.
    QueryDef("q_sql_ctas",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q16")
        dropManaged(s, "q16_ctas_orders")
        s.sql("""
          CREATE TABLE q16_ctas_orders USING parquet AS
          SELECT o_custkey, 0L AS period, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders_q16 WHERE year(o_orderdate) < 1997
          GROUP BY o_custkey""")
        s.sql("""
          INSERT INTO q16_ctas_orders
          SELECT o_custkey, 1L AS period, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders_q16 WHERE year(o_orderdate) >= 1997
          GROUP BY o_custkey""")
        s.table("q16_ctas_orders")
          .select(col("o_custkey"), col("period"),
            col("cnt").cast("long").as("cnt"),
            col("total").cast("double").as("total"))
          .orderBy("o_custkey", "period")
      },
      """SELECT o_custkey, 0::BIGINT AS period, count(*)::BIGINT AS cnt,
        |       sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM orders WHERE year(o_orderdate) < 1997 GROUP BY o_custkey
        |UNION ALL
        |SELECT o_custkey, 1::BIGINT AS period, count(*)::BIGINT AS cnt,
        |       sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM orders WHERE year(o_orderdate) >= 1997 GROUP BY o_custkey
        |ORDER BY o_custkey, period""".stripMargin),

    // MERGE-EXECUTE round-trip: q_sql_merge's scenario run AGAINST A
    // REAL TABLE — CTAS the pre-1997 state, MERGE the 1997+ batch into
    // it on disk ([[graft.ops.Merge.executeInto]]: preview plan →
    // eager materialize → overwrite), read the table back. The oracle
    // is the desugared LEFT JOIN + NOT EXISTS — proving the on-disk
    // post-merge state equals the relational definition of MERGE.
    QueryDef("q_sql_merge_exec",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q16m")
        dropManaged(s, "q16_merge_tgt")
        s.sql("""
          CREATE TABLE q16_merge_tgt USING parquet AS
          SELECT o_custkey, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders_q16m WHERE year(o_orderdate) < 1997
          GROUP BY o_custkey""")
        s.sql("""
          CREATE OR REPLACE TEMP VIEW q16_merge_src AS
          SELECT o_custkey, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders_q16m WHERE year(o_orderdate) >= 1997
          GROUP BY o_custkey""")
        graft.ops.Merge.executeInto(s, """
          MERGE INTO q16_merge_tgt t
          USING q16_merge_src s
          ON t.o_custkey = s.o_custkey
          WHEN MATCHED THEN
            UPDATE SET cnt = t.cnt + s.cnt, total = t.total + s.total
          WHEN NOT MATCHED THEN INSERT (o_custkey, cnt, total)
                                VALUES (s.o_custkey, s.cnt, s.total)""",
          "q16_merge_tgt")
        s.table("q16_merge_tgt")
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
        |         t.cnt + coalesce(s.cnt, 0) AS cnt,
        |         t.total + coalesce(s.total, 0) AS total
        |  FROM tgt t LEFT JOIN src s USING (o_custkey)
        |  UNION ALL
        |  SELECT s.o_custkey, s.cnt, s.total FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM tgt t
        |                    WHERE t.o_custkey = s.o_custkey))
        |SELECT o_custkey, cnt::BIGINT AS cnt, total::DOUBLE AS total
        |FROM merged ORDER BY o_custkey""".stripMargin))
}
