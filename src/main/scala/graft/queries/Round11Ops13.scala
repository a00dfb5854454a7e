package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sharded

/** Round-11 batch 13: classifier-evaluation statistics for
  * quality-filter pipelines — ROC-AUC (the standard readout for "does
  * this learned quality score separate the classes?") and a
  * reliability diagram with expected calibration error (ECE, "are the
  * scores honest probabilities?"). Both run on the embeddings table
  * with a PLANTED signal (score = a coordinate + 0.05 when label=0) so
  * the contracts can pin discrimination, not just execute.
  *
  * Scale shapes: AUC reduces the corpus to the distinct-score
  * histogram with one combinable groupBy, then takes the rank prefix
  * sum through ops/Sharded (distinct scores ≈ N at 100 TB — a plain
  * global window here would be the one-core cliff); calibration is a
  * 10-bin combinable aggregate, integer micro fixed-point throughout.
  */
object Round11Ops13 {

  val defs: Seq[QueryDef] = Seq(

    // One-vs-rest ROC-AUC per label class via the midrank identity
    //   AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻),
    // computed EXACTLY on the distinct-score histogram: for score
    // value v with t_v total rows (before_v = Σ_{u<v} t_u) the doubled
    // midrank is 2·before_v + t_v + 1, so 2·Σranks stays in BIGINT and
    // the only float op is the final division. Ties (the planted +0.05
    // shift can collide coordinates) are exact through the midrank.
    // The prefix sum over the corpus-sized distinct-score frame runs
    // through Sharded.globalPrefixSum (shard = floor(8·score)); the
    // oracle uses the plain SQL window — the decomposition is exact.
    QueryDef("q_stats_auc",
      (s, d) => {
        val scored = Tables.embeddings(s, d)
          .select(
            (element_at(col("embedding"), 2).cast("double")
              + when(col("label") === 0, lit(0.05)).otherwise(lit(0.0))).as("sc"),
            col("label").cast("long").as("label"))
        val bySl = scored.groupBy("sc", "label").agg(count(lit(1)).as("p"))
        val byS = bySl.groupBy("sc").agg(sum("p").cast("long").as("t"))
        val cum = Sharded.globalPrefixSum(byS,
          floor(col("sc") * lit(8.0)).cast("long"), Seq(col("sc")),
          col("t"), "before")
        val tot = byS.agg(sum("t").cast("long").as("n"))
        // Rank sums overflow BIGINT at scale (Σ p·2N ~ 2N² — the same
        // class the 10× profiler caught in q_stats_spearman):
        // accumulate in DECIMAL(38,0), subtract in DOUBLE (identical
        // expression both engines).
        bySl.join(cum, "sc")
          .groupBy("label")
          .agg(sum(col("p").cast("decimal(19,0)")
              * (lit(2) * col("before") + col("t") + lit(1)).cast("decimal(19,0)"))
              .as("sumrank2"),
            sum("p").cast("long").as("npos"))
          .crossJoin(broadcast(tot))
          .select(col("label"), col("npos"),
            (col("n") - col("npos")).cast("long").as("nneg"),
            expr("""(CAST(sumrank2 AS DOUBLE)
                - CAST(npos AS DOUBLE) * (CAST(npos AS DOUBLE) + 1.0))
              / (2.0 * CAST(npos AS DOUBLE) * CAST(n - npos AS DOUBLE))""")
              .as("auc"))
          .orderBy("label")
      },
      """WITH scored AS (
        |  SELECT embedding[2]::DOUBLE
        |      + CASE WHEN label = 0 THEN 0.05 ELSE 0.0 END AS sc,
        |    label::BIGINT AS label
        |  FROM embeddings),
        |bysl AS (SELECT sc, label, count(*)::BIGINT AS p
        |         FROM scored GROUP BY 1, 2),
        |bys AS (SELECT sc, sum(p)::BIGINT AS t FROM bysl GROUP BY 1),
        |cum AS (
        |  SELECT sc, t, coalesce(sum(t) OVER (ORDER BY sc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |    AS before
        |  FROM bys),
        |tot AS (SELECT sum(t)::BIGINT AS n FROM bys),
        |per AS (
        |  SELECT label,
        |    sum(p * (2 * before + t + 1)) AS sumrank2,
        |    sum(p)::BIGINT AS npos
        |  FROM bysl JOIN cum USING (sc) GROUP BY 1)
        |SELECT label, npos, (n - npos)::BIGINT AS nneg,
        |  (sumrank2::DOUBLE - npos::DOUBLE * (npos::DOUBLE + 1.0))
        |    / (2.0 * npos::DOUBLE * (n - npos)::DOUBLE) AS auc
        |FROM per, tot ORDER BY label""".stripMargin),

    // Reliability diagram + ECE for the same planted score squashed to
    // a probability by the softsign map p = 1/2 + sc/(2(1+|sc|)) —
    // pure +,·,/,abs arithmetic, bit-identical on both engines (no
    // transcendentals). 10 fixed bins on p; per bin: count, positives
    // (label = 0), mean confidence in micro fixed-point
    // (floor(p·1e12) summed as BIGINT — order-free and exact), empirical
    // accuracy, and |acc − conf|. The `__ece__` summary row folds the
    // 10 n_b·gap_b terms SORTED (both engines add in one order) and
    // divides by N. Entirely combinable aggregates — nothing here ever
    // exceeds 10 rows after the first groupBy.
    QueryDef("q_quality_calibration",
      (s, d) => {
        val scored = Tables.embeddings(s, d)
          .select(
            (element_at(col("embedding"), 2).cast("double")
              + when(col("label") === 0, lit(0.05)).otherwise(lit(0.0))).as("sc"),
            (col("label") === 0).as("y"))
          .withColumn("p",
            lit(0.5) + col("sc") / (lit(2.0) * (lit(1.0) + abs(col("sc")))))
          .withColumn("bin", least(lit(9L), floor(col("p") * lit(10.0)).cast("long")))
        val bins = scored.groupBy("bin")
          .agg(count(lit(1)).cast("long").as("n"),
            count(when(col("y"), lit(1))).cast("long").as("pos"),
            sum(floor(col("p") * lit(1e12)).cast("long")).cast("long").as("pfx"))
          .select(col("bin"), col("n"), col("pos"),
            (col("pfx").cast("double") / lit(1e12) / col("n").cast("double"))
              .as("conf"),
            (col("pos").cast("double") / col("n").cast("double")).as("acc"))
          .withColumn("gap", abs(col("acc") - col("conf")))
        val ece = bins
          .groupBy(lit(1))
          .agg(sum("n").cast("long").as("n"),
            sum("pos").cast("long").as("pos"),
            array_sort(collect_list(struct(col("bin"),
              (col("n").cast("double") * col("gap")).as("w")))).as("ws"))
          .select(lit(-1L).as("bin"), col("n"), col("pos"),
            lit(0.0).as("conf"), lit(0.0).as("acc"),
            (aggregate(transform(col("ws"), e => e.getField("w")),
              lit(0.0), (acc, x) => acc + x) / col("n").cast("double"))
              .as("gap"))
        bins.unionAll(ece).orderBy("bin")
      },
      """WITH scored AS (
        |  SELECT sc, 0.5 + sc / (2.0 * (1.0 + abs(sc))) AS p,
        |    (label = 0) AS y
        |  FROM (SELECT embedding[2]::DOUBLE
        |          + CASE WHEN label = 0 THEN 0.05 ELSE 0.0 END AS sc, label
        |        FROM embeddings)),
        |binned AS (
        |  SELECT least(9, floor(p * 10.0))::BIGINT AS bin, p, y FROM scored),
        |bins AS (
        |  SELECT bin, count(*)::BIGINT AS n,
        |    count(CASE WHEN y THEN 1 END)::BIGINT AS pos,
        |    sum(floor(p * 1e12)::BIGINT)::BIGINT AS pfx
        |  FROM binned GROUP BY 1),
        |diag AS (
        |  SELECT bin, n, pos,
        |    pfx::DOUBLE / 1e12 / n::DOUBLE AS conf,
        |    pos::DOUBLE / n::DOUBLE AS acc
        |  FROM bins),
        |withgap AS (
        |  SELECT bin, n, pos, conf, acc, abs(acc - conf) AS gap FROM diag),
        |ece AS (
        |  SELECT -1::BIGINT AS bin, sum(n)::BIGINT AS n, sum(pos)::BIGINT AS pos,
        |    0.0 AS conf, 0.0 AS acc,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(bin := bin, w := n::DOUBLE * gap))),
        |      e -> struct_extract(e, 'w'))), (x, y) -> x + y)
        |      / sum(n)::DOUBLE AS gap
        |  FROM withgap)
        |SELECT bin, n, pos, conf, acc, gap FROM withgap
        |UNION ALL SELECT bin, n, pos, conf, acc, gap FROM ece
        |ORDER BY bin""".stripMargin),
  )
}
