package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 22: a columnar-encoding advisor (measure, per
  * candidate layout, how RLE/dict-friendly each column would be inside
  * each file — the statistic that decides whether a z-order rewrite
  * pays for itself) and an n-gram novelty curve (per doc, how much of
  * it is the corpus's FIRST sighting — the memorization/duplication
  * readout curation tracks as a corpus grows).
  *
  * Scale shapes: the advisor's windows partition by file (the
  * compression unit — bounded by design) under both layouts; novelty
  * is one distinct-shingle explode, one combinable min, one shingle
  * equi-join — never doc×doc.
  */
object Round11Ops22 {

  val defs: Seq[QueryDef] = Seq(

    // Encoding advisor: for the NATURAL (orderkey-range files) and
    // Z-ORDER (zval files, q_layout_zorder's curve) layouts, count per
    // file the RLE runs (value changes + 1 per file) and distinct
    // values of three low-cardinality columns, then total per
    // (layout, column). Fewer runs/distincts per file ⇒ better
    // RLE/dict encoding under that layout — measured, not guessed.
    QueryDef("q_layout_encoding_advisor",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_returnflag", "l_linestatus", "l_quantity")
        val m = broadcast(li.agg(
          max("l_partkey").as("mp"), max("l_suppkey").as("ms"),
          max("l_orderkey").as("mo")))
        val base = li.crossJoin(m)
          .withColumn("x", expr("((l_partkey - 1) * 16) div mp"))
          .withColumn("y", expr("((l_suppkey - 1) * 16) div ms"))
          .withColumn("zfile", expr(
            """shiftleft((x       & 1), 0) + shiftleft((y       & 1), 1) +
               shiftleft((shiftright(x, 1) & 1), 2) + shiftleft((shiftright(y, 1) & 1), 3) +
               shiftleft((shiftright(x, 2) & 1), 4) + shiftleft((shiftright(y, 2) & 1), 5) +
               shiftleft((shiftright(x, 3) & 1), 6) + shiftleft((shiftright(y, 3) & 1), 7)"""))
          .withColumn("nfile", expr("((l_orderkey - 1) * 256) div mo"))
        def profile(layout: String, fileCol: String) = {
          val w = Window.partitionBy(col(fileCol))
            .orderBy(col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey"))
          val perFile = base
            .withColumn("r_rf", when(lag(col("l_returnflag"), 1).over(w).isNull ||
              lag(col("l_returnflag"), 1).over(w) =!= col("l_returnflag"), 1L)
              .otherwise(0L))
            .withColumn("r_ls", when(lag(col("l_linestatus"), 1).over(w).isNull ||
              lag(col("l_linestatus"), 1).over(w) =!= col("l_linestatus"), 1L)
              .otherwise(0L))
            .withColumn("r_sm", when(lag(col("l_quantity"), 1).over(w).isNull ||
              lag(col("l_quantity"), 1).over(w) =!= col("l_quantity"), 1L)
              .otherwise(0L))
            .groupBy(col(fileCol).as("f"))
            .agg(count(lit(1)).as("n"),
              sum("r_rf").as("runs_rf"), sum("r_ls").as("runs_ls"),
              sum("r_sm").as("runs_sm"),
              countDistinct("l_returnflag").as("nd_rf"),
              countDistinct("l_linestatus").as("nd_ls"),
              countDistinct("l_quantity").as("nd_sm"))
          val tot = perFile.agg(
            count(lit(1)).cast("long").as("n_files"),
            sum("n").cast("long").as("n_rows"),
            sum("runs_rf").cast("long").as("t_rf"),
            sum("runs_ls").cast("long").as("t_ls"),
            sum("runs_sm").cast("long").as("t_sm"),
            sum("nd_rf").cast("long").as("d_rf"),
            sum("nd_ls").cast("long").as("d_ls"),
            sum("nd_sm").cast("long").as("d_sm"))
          tot.selectExpr(
            s"'$layout' AS layout",
            """stack(3,
              'l_returnflag', t_rf, d_rf,
              'l_linestatus', t_ls, d_ls,
              'l_quantity',   t_sm, d_sm) AS (col_name, n_runs, nd_sum)""",
            "n_files", "n_rows")
        }
        profile("natural", "nfile").unionAll(profile("zorder", "zfile"))
          .select(col("layout"), col("col_name"), col("n_files"), col("n_rows"),
            col("n_runs").cast("long").as("n_runs"),
            col("nd_sum").cast("long").as("nd_sum"),
            (col("n_rows").cast("double") / col("n_runs").cast("double"))
              .as("avg_run_len"))
          .orderBy("layout", "col_name")
      },
      """WITH m AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms,
        |                  max(l_orderkey) AS mo FROM lineitem),
        |b AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |        l_returnflag, l_linestatus, l_quantity,
        |        ((l_partkey - 1) * 16) // mp AS x,
        |        ((l_suppkey - 1) * 16) // ms AS y,
        |        ((l_orderkey - 1) * 256) // mo AS nfile
        |      FROM lineitem, m),
        |z AS (SELECT *,
        |        ((x & 1) << 0) + ((y & 1) << 1) +
        |        (((x >> 1) & 1) << 2) + (((y >> 1) & 1) << 3) +
        |        (((x >> 2) & 1) << 4) + (((y >> 2) & 1) << 5) +
        |        (((x >> 3) & 1) << 6) + (((y >> 3) & 1) << 7) AS zfile
        |      FROM b),
        |flags AS (
        |  SELECT layout, f, l_returnflag, l_linestatus, l_quantity,
        |    CASE WHEN lag(l_returnflag) OVER w IS NULL
        |      OR lag(l_returnflag) OVER w <> l_returnflag THEN 1 ELSE 0 END AS r_rf,
        |    CASE WHEN lag(l_linestatus) OVER w IS NULL
        |      OR lag(l_linestatus) OVER w <> l_linestatus THEN 1 ELSE 0 END AS r_ls,
        |    CASE WHEN lag(l_quantity) OVER w IS NULL
        |      OR lag(l_quantity) OVER w <> l_quantity THEN 1 ELSE 0 END AS r_sm
        |  FROM (SELECT 'natural' AS layout, nfile AS f, * FROM z
        |        UNION ALL SELECT 'zorder' AS layout, zfile AS f, * FROM z)
        |  WINDOW w AS (PARTITION BY layout, f
        |    ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey)),
        |per_file AS (
        |  SELECT layout, f, count(*) AS n,
        |    sum(r_rf) AS runs_rf, sum(r_ls) AS runs_ls, sum(r_sm) AS runs_sm,
        |    count(DISTINCT l_returnflag) AS nd_rf,
        |    count(DISTINCT l_linestatus) AS nd_ls,
        |    count(DISTINCT l_quantity) AS nd_sm
        |  FROM flags GROUP BY 1, 2),
        |tot AS (
        |  SELECT layout, count(*)::BIGINT AS n_files, sum(n)::BIGINT AS n_rows,
        |    sum(runs_rf)::BIGINT AS t_rf, sum(runs_ls)::BIGINT AS t_ls,
        |    sum(runs_sm)::BIGINT AS t_sm,
        |    sum(nd_rf)::BIGINT AS d_rf, sum(nd_ls)::BIGINT AS d_ls,
        |    sum(nd_sm)::BIGINT AS d_sm
        |  FROM per_file GROUP BY 1),
        |melted AS (
        |  SELECT layout, 'l_returnflag' AS col_name, n_files, n_rows,
        |    t_rf AS n_runs, d_rf AS nd_sum FROM tot
        |  UNION ALL SELECT layout, 'l_linestatus', n_files, n_rows, t_ls, d_ls
        |    FROM tot
        |  UNION ALL SELECT layout, 'l_quantity', n_files, n_rows, t_sm, d_sm
        |    FROM tot)
        |SELECT layout, col_name, n_files, n_rows, n_runs, nd_sum,
        |  n_rows::DOUBLE / n_runs::DOUBLE AS avg_run_len
        |FROM melted ORDER BY layout, col_name""".stripMargin),

    // N-gram novelty: per doc, the share of its DISTINCT word trigrams
    // whose first corpus occurrence (min doc_id) is this doc — 1.0 for
    // all-new text, near 0 for boilerplate/duplicates. One distinct
    // shingle set per doc, one combinable min per shingle, one
    // shingle-keyed equi-join.
    QueryDef("q_text_ngram_novelty",
      (s, d) => {
        val tris = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
          .select(col("doc_id"),
            explode(expr("""CASE WHEN size(t) >= 3 THEN transform(
              sequence(1, size(t) - 2),
              i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                element_at(t, i + 2)))
              ELSE CAST(array() AS ARRAY<STRING>) END""")).as("tri"))
          .distinct()
        val first = tris.groupBy("tri").agg(min("doc_id").as("first_doc"))
        tris.join(first, "tri")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_tri"),
            count(when(col("first_doc") === col("doc_id"), lit(1)))
              .cast("long").as("n_novel"))
          .withColumn("novelty",
            col("n_novel").cast("double") / col("n_tri").cast("double"))
          .orderBy("doc_id")
      },
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |idx AS (
        |  SELECT doc_id, t, unnest(range(1, greatest(1, len(t) - 1))) AS i
        |  FROM toks),
        |tris AS (
        |  SELECT DISTINCT doc_id,
        |    concat_ws(' ', t[i], t[i + 1], t[i + 2]) AS tri
        |  FROM idx),
        |first AS (SELECT tri, min(doc_id) AS first_doc FROM tris GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_tri,
        |  count(CASE WHEN first_doc = doc_id THEN 1 END)::BIGINT AS n_novel,
        |  count(CASE WHEN first_doc = doc_id THEN 1 END)::DOUBLE
        |    / count(*)::DOUBLE AS novelty
        |FROM tris JOIN first USING (tri)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
  )
}
