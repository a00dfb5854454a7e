package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 4: token-budget allocation — the planning step that
  * turns mixing WEIGHTS (q_mix_temperature) into actual per-source
  * token QUOTAS under a global budget with per-source caps.
  */
object Round11Ops4 {

  val defs: Seq[QueryDef] = Seq(

    // Waterfill allocation: spend a global budget B (= half the corpus'
    // tokens) across sources, capping each source at its own token
    // count — small sources keep everything, large sources level off at
    // the common fill θ: a_s = min(c_s, θ) with θ the largest integer
    // level keeping Σ a_s ≤ B. The classic max-min fair allocator
    // (identical math to link-bandwidth fair sharing), here sizing how
    // many tokens each source contributes to a training mix.
    //
    // Everything is integer: per-source counts from ONE combinable
    // scan; the waterfill solves on the |sources|-row frame (sorted
    // ascending with prefix sums — an unpartitioned window strictly
    // ABOVE the aggregate, the house rule), picking the FIRST row k
    // where θ_k = (B − prefix_{k−1}) div (n−k+1) fits under c_k; floor
    // division keeps Σ a ≤ B exactly. Output: per-source quota +
    // saturation flag, plus a __total__ row pinning B and the spend.
    QueryDef("q_mix_budget_waterfill",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"),
            size(filter(split(col("text"), " "), w => length(w) > 0))
              .cast("long").as("t"))
          .groupBy("source").agg(sum("t").as("c"))
        val tot = broadcast(counts.agg(sum("c").as("total"),
          count(lit(1)).as("n"))
          .withColumn("budget", expr("total div 2")))
        val w = Window.orderBy(col("c").asc, col("source").asc)
        val ranked = counts.crossJoin(tot)
          .withColumn("rn", row_number().over(w))
          .withColumn("prefix", sum("c").over(w
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("theta_k",
            expr("(budget - (prefix - c)) div (n - rn + 1)"))
        // the fill level: θ of the FIRST (ascending) row whose θ_k fits
        // under its own cap; if none fits, the budget covers everything
        val level = broadcast(ranked.filter(col("theta_k") <= col("c"))
          .agg(min_by(col("theta_k"), col("rn")).as("theta")))
        val alloc = ranked.crossJoin(level)
          .select(col("source"), col("c").as("n_tokens"),
            when(col("theta").isNull, col("c"))
              .otherwise(least(col("c"), col("theta"))).as("allocation"),
            (col("theta").isNotNull && col("c") > col("theta"))
              .as("saturated"),
            col("budget"))
        val total = alloc
          .agg(sum("n_tokens").as("n_tokens"), sum("allocation").as("allocation"),
            max("budget").as("budget"))
          .select(lit("__total__").as("source"), col("n_tokens"),
            col("allocation"), lit(false).as("saturated"))
        alloc.drop("budget").unionAll(total).orderBy("source")
      },
      """WITH counts AS (
        |  SELECT source, sum(len(list_filter(string_split(text, ' '),
        |    w -> w <> '')))::BIGINT AS c
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(c)::BIGINT AS total, count(*)::BIGINT AS n,
        |               (sum(c) // 2)::BIGINT AS budget FROM counts),
        |ranked AS (
        |  SELECT source, c, budget, n,
        |    row_number() OVER w AS rn,
        |    (sum(c) OVER (w ROWS UNBOUNDED PRECEDING))::BIGINT AS prefix
        |  FROM counts, tot
        |  WINDOW w AS (ORDER BY c ASC, source ASC)),
        |cand AS (
        |  SELECT *, ((budget - (prefix - c)) // (n - rn + 1))::BIGINT AS theta_k
        |  FROM ranked),
        |lvl AS (SELECT arg_min(theta_k, rn) AS theta FROM cand
        |        WHERE theta_k <= c),
        |alloc AS (
        |  SELECT source, c AS n_tokens,
        |    (CASE WHEN theta IS NULL THEN c ELSE least(c, theta) END)::BIGINT
        |      AS allocation,
        |    (theta IS NOT NULL AND c > theta) AS saturated
        |  FROM cand, lvl)
        |SELECT source, n_tokens, allocation, saturated FROM alloc
        |UNION ALL
        |SELECT '__total__', sum(n_tokens)::BIGINT, sum(allocation)::BIGINT,
        |  false FROM alloc
        |ORDER BY source""".stripMargin),
  )
}
