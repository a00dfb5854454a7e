package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import Round16Ops3.dropManaged

/** Round-17 batch 1: the SQL-pipeline surface — multi-statement script
  * execution and the PARTITIONED MERGE-execute the r16 verdict asked
  * for (`ops/Merge.executeInto`'s own scaladoc promised the bounded
  * variant).
  *
  *   - q_sql_script: CTAS → INSERT INTO → MERGE → SELECT as ONE script
  *     text through [[graft.plans.SqlScript]] — the statements the
  *     writable-catalog rungs proved individually (rounds 16–17),
  *     sequenced the way a warehouse user actually ships them (a dbt
  *     model / psql -f file). The gate hashes the read-back of what the
  *     whole pipeline left on disk.
  *   - q_sql_merge_exec_part: MERGE-execute against a target
  *     PARTITIONED BY a key band, published with dynamic partition
  *     overwrite restricted to the partitions the delta touches
  *     ([[graft.ops.Merge.executeIntoPartitioned]]) — only those
  *     partitions are rewritten; Round17Spec pins untouched partitions'
  *     files byte-identical across the merge. This is the production
  *     parquet-upsert shape: the full-table rewrite (q_sql_merge_exec)
  *     is the documented price of row-level ops on unpartitioned
  *     parquet, and partition-bounded publish is how a real job caps it.
  *
  * Scale: both stay Spark's native distributed parquet writers; the
  * script runner only sequences statements on the driver. The
  * partitioned merge's publish is O(affected partitions) data, and the
  * `bkt IN affected` filter prunes the target READ to the same bound
  * (partition columns pass through the preview's update projections
  * untouched, so the filter reaches the scan).
  */
object Round17Ops {

  val defs: Seq[QueryDef] = Seq(

    // CTAS (pre-1996 state) → INSERT INTO (the 1996 tail — same keys
    // may land twice, so the table legitimately holds duplicate-key
    // rows and the MERGE's one-source-to-many-target update semantics
    // are exercised) → MERGE (1997+ delta: update every matching row,
    // insert new keys) → SELECT reads back the filtered final state.
    QueryDef("q_sql_script",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q17s")
        dropManaged(s, "q17_script_tgt")
        graft.plans.SqlScript.run(s, """
          -- the pipeline a warehouse task ships as one file
          CREATE TABLE q17_script_tgt USING parquet AS
          SELECT o_custkey, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders_q17s WHERE year(o_orderdate) < 1996
          GROUP BY o_custkey;

          INSERT INTO q17_script_tgt
          SELECT o_custkey, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders_q17s WHERE year(o_orderdate) = 1996
          GROUP BY o_custkey;

          CREATE OR REPLACE TEMP VIEW q17_script_src AS
          SELECT o_custkey, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders_q17s WHERE year(o_orderdate) >= 1997
          GROUP BY o_custkey;

          MERGE INTO q17_script_tgt t
          USING q17_script_src s
          ON t.o_custkey = s.o_custkey
          WHEN MATCHED THEN
            UPDATE SET cnt = t.cnt + s.cnt, total = t.total + s.total
          WHEN NOT MATCHED THEN INSERT (o_custkey, cnt, total)
                                VALUES (s.o_custkey, s.cnt, s.total);

          SELECT o_custkey, CAST(cnt AS BIGINT) AS cnt,
                 CAST(total AS DOUBLE) AS total
          FROM q17_script_tgt WHERE cnt >= 2
          ORDER BY o_custkey, cnt, total""")
      },
      // the whole pipeline as one relational expression: tgt after
      // CTAS ∪ INSERT, then the desugared MERGE (LEFT JOIN update +
      // NOT EXISTS insert), then the script's final SELECT
      """WITH t0 AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt,
        |         sum(o_totalprice::DECIMAL(18,2)) AS total
        |  FROM orders WHERE year(o_orderdate) < 1996 GROUP BY 1),
        |t1 AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt,
        |         sum(o_totalprice::DECIMAL(18,2)) AS total
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
        |tgt AS (SELECT * FROM t0 UNION ALL SELECT * FROM t1),
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
        |FROM merged WHERE cnt >= 2
        |ORDER BY o_custkey, cnt, total""".stripMargin),

    // Partitioned MERGE-execute: target PARTITIONED BY bkt =
    // o_custkey % 8; the 1997+ delta is restricted to 2 of the 8 bands,
    // so the publish rewrites exactly those two partition directories
    // and leaves the other six byte-identical on disk (spec-pinned).
    // `affected` is computed from the source itself — a distinct over
    // its partition expression, the way a production upsert job knows
    // its delta's partitions.
    QueryDef("q_sql_merge_exec_part",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q17p")
        dropManaged(s, "q17_merge_part_tgt")
        s.sql("""
          CREATE TABLE q17_merge_part_tgt USING parquet PARTITIONED BY (bkt) AS
          SELECT o_custkey, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
                 CAST(o_custkey % 8 AS BIGINT) AS bkt
          FROM orders_q17p WHERE year(o_orderdate) < 1997
          GROUP BY o_custkey""")
        s.sql("""
          CREATE OR REPLACE TEMP VIEW q17_merge_part_src AS
          SELECT o_custkey, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
                 CAST(o_custkey % 8 AS BIGINT) AS bkt
          FROM orders_q17p
          WHERE year(o_orderdate) >= 1997 AND o_custkey % 8 IN (0, 3)
          GROUP BY o_custkey""")
        val affected = s.table("q17_merge_part_src").select("bkt").distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        graft.ops.Merge.executeIntoPartitioned(s, """
          MERGE INTO q17_merge_part_tgt t
          USING q17_merge_part_src s
          ON t.o_custkey = s.o_custkey
          WHEN MATCHED THEN
            UPDATE SET cnt = t.cnt + s.cnt, total = t.total + s.total
          WHEN NOT MATCHED THEN INSERT (o_custkey, cnt, total, bkt)
                                VALUES (s.o_custkey, s.cnt, s.total, s.bkt)""",
          "q17_merge_part_tgt", "bkt", affected)
        s.table("q17_merge_part_tgt")
          .select(col("o_custkey"), col("cnt").cast("long").as("cnt"),
            col("total").cast("double").as("total"),
            col("bkt").cast("long").as("bkt"))
          .orderBy("o_custkey")
      },
      """WITH tgt AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt,
        |         sum(o_totalprice::DECIMAL(18,2)) AS total,
        |         (o_custkey % 8)::BIGINT AS bkt
        |  FROM orders WHERE year(o_orderdate) < 1997 GROUP BY o_custkey),
        |src AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt,
        |         sum(o_totalprice::DECIMAL(18,2)) AS total,
        |         (o_custkey % 8)::BIGINT AS bkt
        |  FROM orders
        |  WHERE year(o_orderdate) >= 1997 AND o_custkey % 8 IN (0, 3)
        |  GROUP BY o_custkey),
        |merged AS (
        |  SELECT t.o_custkey,
        |         t.cnt + coalesce(s.cnt, 0) AS cnt,
        |         t.total + coalesce(s.total, 0) AS total,
        |         t.bkt
        |  FROM tgt t LEFT JOIN src s USING (o_custkey)
        |  UNION ALL
        |  SELECT s.o_custkey, s.cnt, s.total, s.bkt FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM tgt t
        |                    WHERE t.o_custkey = s.o_custkey))
        |SELECT o_custkey, cnt::BIGINT AS cnt, total::DOUBLE AS total,
        |       bkt::BIGINT AS bkt
        |FROM merged ORDER BY o_custkey""".stripMargin))
}
