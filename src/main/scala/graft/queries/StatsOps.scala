package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Closed-form statistical modelling over relations — the "fit a tiny
  * model INSIDE the warehouse" family (OLS via normal equations,
  * chi-squared independence). Everything here reduces to exact decimal
  * co-moments (the q_agg_corr technique, [[Relational2]]) followed by a
  * fixed scalar formula evaluated in the same IEEE operation order on
  * both engines, so results hash-match bit-for-bit without any
  * tolerance machinery.
  *
  * Scale design: each query is one map-side-combined groupBy whose
  * shuffle carries O(groups) rows of fixed-width co-moment sums — the
  * canonical distributed-statistics shape. Model state never exceeds a
  * handful of doubles per group; nothing is collected to the driver.
  */
object StatsOps {

  val defs: Seq[QueryDef] = Seq(
    // Two-feature ordinary least squares per group, solved in closed
    // form from the 2x2 normal equations: l_quantity ~ l_discount +
    // l_tax within each return flag. Features/target are deliberately
    // small-valued (quantity <= 50, rates <= 0.1, all DECIMAL(18,2))
    // so every co-moment's unscaled integer stays far below 2^53 and
    // the decimal->double conversion is EXACT on both engines — the
    // q_agg_corr scaladoc documents why large co-moments (price^2)
    // can differ by 1 ulp between BigDecimal and DuckDB's int128
    // conversion. One aggregation pass computes all eight sums; the
    // solve is per-group scalar arithmetic in identical IEEE order.
    QueryDef("q_stats_ols",
      (s, d) => {
        val y = col("l_quantity").cast("decimal(18,2)")
        val x1 = col("l_discount").cast("decimal(18,2)")
        val x2 = col("l_tax").cast("decimal(18,2)")
        // balanced (r17): ten decimal sums/row of partial-agg work ran
        // single-threaded in the one-row-group scan stage
        Tables.balanced(Tables.lineitem(s, d)
            .select("l_returnflag", "l_quantity", "l_discount", "l_tax"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x1).cast("double").as("s1"), sum(x2).cast("double").as("s2"),
            sum(y).cast("double").as("sy"),
            sum(x1 * x1).cast("double").as("s11"),
            sum(x2 * x2).cast("double").as("s22"),
            sum(x1 * x2).cast("double").as("s12"),
            sum(x1 * y).cast("double").as("s1y"),
            sum(x2 * y).cast("double").as("s2y"),
            sum(y * y).cast("double").as("syy"))
          .select(col("l_returnflag"), col("n"),
            // centered second moments (times n) — exact differences of
            // exactly-converted doubles
            (col("n") * col("s11") - col("s1") * col("s1")).as("c11"),
            (col("n") * col("s22") - col("s2") * col("s2")).as("c22"),
            (col("n") * col("s12") - col("s1") * col("s2")).as("c12"),
            (col("n") * col("s1y") - col("s1") * col("sy")).as("c1y"),
            (col("n") * col("s2y") - col("s2") * col("sy")).as("c2y"),
            (col("n") * col("syy") - col("sy") * col("sy")).as("cyy"),
            col("s1"), col("s2"), col("sy"))
          .select(col("l_returnflag"), col("n"),
            ((col("c22") * col("c1y") - col("c12") * col("c2y")) /
              (col("c11") * col("c22") - col("c12") * col("c12"))).as("b1"),
            ((col("c11") * col("c2y") - col("c12") * col("c1y")) /
              (col("c11") * col("c22") - col("c12") * col("c12"))).as("b2"),
            col("c1y"), col("c2y"), col("cyy"),
            col("s1"), col("s2"), col("sy"))
          .select(col("l_returnflag"), col("n"), col("b1"), col("b2"),
            ((col("sy") - col("b1") * col("s1") - col("b2") * col("s2")) /
              col("n")).as("b0"),
            ((col("b1") * col("c1y") + col("b2") * col("c2y")) /
              col("cyy")).as("r2"))
          .orderBy("l_returnflag")
      },
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
             (SUM(CAST(l_discount AS DECIMAL(18,2))))::DOUBLE AS s1,
             (SUM(CAST(l_tax AS DECIMAL(18,2))))::DOUBLE AS s2,
             (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sy,
             (SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))))::DOUBLE AS s11,
             (SUM(CAST(l_tax AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))))::DOUBLE AS s22,
             (SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))))::DOUBLE AS s12,
             (SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS s1y,
             (SUM(CAST(l_tax AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS s2y,
             (SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS syy
           FROM lineitem GROUP BY l_returnflag),
         c AS (
           SELECT l_returnflag, n,
             n * s11 - s1 * s1 AS c11, n * s22 - s2 * s2 AS c22,
             n * s12 - s1 * s2 AS c12,
             n * s1y - s1 * sy AS c1y, n * s2y - s2 * sy AS c2y,
             n * syy - sy * sy AS cyy,
             s1, s2, sy
           FROM m),
         b AS (
           SELECT l_returnflag, n,
             (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
             (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2,
             c1y, c2y, cyy, s1, s2, sy
           FROM c)
         SELECT l_returnflag, n, b1, b2,
           (sy - b1 * s1 - b2 * s2) / n AS b0,
           (b1 * c1y + b2 * c2y) / cyy AS r2
         FROM b ORDER BY l_returnflag"""),

    // Pearson chi-squared test of independence: event_type x 6-hour
    // time-of-day bucket over the events stream — the drift/imbalance
    // diagnostic a data pipeline runs before trusting a split. Observed
    // counts and marginals are exact integers; each cell's
    // (o - e)^2 / e term is evaluated in identical double order, and
    // the final sum over cells is an array_sort'd left fold (double
    // addition is order-sensitive; the q_text_entropy technique). Cell
    // count is bounded by |event_type| * 4 regardless of row count, so
    // the collect_list holds dozens of structs, never data-scaled rows.
    QueryDef("q_stats_chisq",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cells = Tables.events(s, d)
          .select(col("event_type"), expr("hour(ts) div 6").cast("long").as("tod"))
          .groupBy("event_type", "tod").agg(count(lit(1)).as("o"))
        val wt = Window.partitionBy("event_type")
        val wb = Window.partitionBy("tod")
        val wall = Window.partitionBy()
        cells
          .withColumn("rt", sum("o").over(wt))
          .withColumn("ct", sum("o").over(wb))
          .withColumn("n", sum("o").over(wall))
          .withColumn("e",
            col("rt").cast("double") * col("ct").cast("double") /
              col("n").cast("double"))
          .withColumn("term",
            (col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e"))
          .groupBy(lit(1).as("g"))
          .agg(max("n").as("n"),
            count(lit(1)).cast("long").as("n_cells"),
            ((countDistinct("event_type") - 1) *
              (countDistinct("tod") - 1)).cast("long").as("dof"),
            array_sort(collect_list(
              struct(col("event_type"), col("tod"), col("term")))).as("terms"))
          .select(col("n"), col("n_cells"), col("dof"),
            aggregate(col("terms"), lit(0.0),
              (acc, e) => acc + e.getField("term")).as("chi2"))
      },
      """WITH cells AS (
           SELECT event_type, (hour(ts) // 6)::BIGINT AS tod, count(*) AS o
           FROM events GROUP BY 1, 2),
         t AS (
           SELECT event_type, tod, o,
             sum(o) OVER (PARTITION BY event_type) AS rt,
             sum(o) OVER (PARTITION BY tod) AS ct,
             sum(o) OVER () AS n
           FROM cells),
         terms AS (
           SELECT event_type, tod, n,
             (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
               * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
               / (rt::DOUBLE * ct::DOUBLE / n::DOUBLE) AS term
           FROM t)
         SELECT max(n)::BIGINT AS n, count(*)::BIGINT AS n_cells,
           ((count(DISTINCT event_type) - 1) * (count(DISTINCT tod) - 1))::BIGINT AS dof,
           list_reduce(list_prepend(0.0, list_transform(
               list_sort(list(struct_pack(
                 event_type := event_type, tod := tod, term := term))),
               e -> struct_extract(e, 'term'))),
             (a, b) -> a + b) AS chi2
         FROM terms"""),

    // Hash-seeded Poisson bootstrap: a 16-replicate confidence interval
    // for the per-flag mean quantity, fully DETERMINISTIC — each row's
    // resample weight in replicate b is Poisson(1) drawn from an
    // md5-derived uniform (the standard streaming-bootstrap
    // approximation to multinomial resampling; tail truncated at w=4,
    // < 0.4% of mass). The hash budget is the cost driver (md5 IS this
    // query's floor), so ONE 128-bit digest feeds ALL 16 replicates —
    // 2 hex chars (8 uniform bits) each, plenty for a 5-bucket Poisson
    // CDF — and the replicates ride as 32 AGGREGATE COLUMNS
    // (sum(q·w_b), sum(w_b) per b) instead of a 16× row explode: the
    // input is scanned once at its native row count, every partial is
    // map-side combined, and the shuffle carries 5 flags × 32 numbers.
    // (Earlier shape: 8 digests + explode(16) — 28 s; then 60-bit
    // halves — 10 s; this column-ride form — ~2 s at sf0.1.) The
    // bucket test is a fixed-length-hex STRING compare against
    // embedded literals (no conv, no division, no runtime float — hex
    // order IS numeric order). Weighted sums are exact decimal
    // numerators over integer weight denominators; the replicate-mean
    // spread folds in b order (16 doubles, fixed size at any corpus).
    // This is how error bars come off a 100 TB aggregate without a
    // second pass: the replicate dimension rides the same shuffle as
    // the aggregate itself.
    QueryDef("q_stats_bootstrap",
      (s, d) => {
        val rk = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
        // Poisson(1) CDF cut points as 8-bit hex literals ('5e'=94,
        // 'bc'=188, 'eb'=235, 'fb'=251 of 256): fixed-length lowercase
        // hex compares lexicographically AS its numeric value.
        def wOf(b: Int): org.apache.spark.sql.Column = {
          val h = substring(col("dig"), 2 * b + 1, 2)
          when(h < "5e", 0L).when(h < "bc", 1L)
            .when(h < "eb", 2L).when(h < "fb", 3L).otherwise(4L)
        }
        // exact integer cents, not DECIMAL: BigDecimal multiply ×16
        // per row was the residual cost after the hash cut (4.5 s →
        // ~2 s at sf0.1); long math is codegen-primitive and the sums
        // stay exact (5e3 cents × w≤4 × 6e9 rows ≈ 1.2e17 << 2^63)
        // balanced BEFORE the md5 + 32 weight-case evaluations (r17):
        // the per-row hash/case work is this query's floor and ran
        // single-threaded in the one-row-group scan stage; the
        // rebalance moves 6 narrow columns once (no-op on real
        // multi-file input)
        val base = Tables.balanced(Tables.lineitem(s, d)
            .select("l_returnflag", "l_quantity", "l_orderkey",
              "l_linenumber", "l_partkey", "l_suppkey"))
          .select(col("l_returnflag"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("q"),
            md5(rk).as("dig"))
        val aggs = (0 until 16).flatMap(b => Seq(
          sum(col("q") * wOf(b)).as(s"sq$b"),
          sum(wOf(b)).as(s"sw$b")))
        val ms = array((0 until 16).map(b =>
          col(s"sq$b").cast("double") / col(s"sw$b").cast("double")
            / lit(100.0)): _*)
        base.groupBy("l_returnflag")
          .agg(aggs.head, aggs.tail: _*)
          .select(col("l_returnflag"), ms.as("ms"))
          .select(col("l_returnflag"),
            (aggregate(col("ms"), lit(0.0), (acc, m) => acc + m) / 16.0)
              .as("boot_mean"),
            col("ms"))
          .select(col("l_returnflag"), col("boot_mean"),
            sqrt(aggregate(col("ms"), lit(0.0), (acc, m) => {
              val dev = m - col("boot_mean")
              acc + dev * dev
            }) / 15.0).as("boot_sd"))
          .select(col("l_returnflag"), col("boot_mean"), col("boot_sd"),
            (col("boot_mean") - lit(1.96) * col("boot_sd")).as("ci_lo"),
            (col("boot_mean") + lit(1.96) * col("boot_sd")).as("ci_hi"))
          .orderBy("l_returnflag")
      },
      {
        def wCase(b: Int) = {
          val sub = s"substring(dig, ${2 * b + 1}, 2)"
          s"CASE WHEN $sub < '5e' THEN 0 WHEN $sub < 'bc' THEN 1 " +
            s"WHEN $sub < 'eb' THEN 2 WHEN $sub < 'fb' THEN 3 ELSE 4 END AS w$b"
        }
        val wCols = (0 until 16).map(wCase).mkString(",\n             ")
        val mbCols = (0 until 16).map(b =>
          s"(SUM(q * w$b))::DOUBLE / SUM(w$b)::DOUBLE / 100.0 AS mb$b")
          .mkString(",\n             ")
        val mbList = (0 until 16).map(b => s"mb$b").mkString(", ")
        // explicit parens pin the same left-to-right IEEE fold order
        // as Spark's aggregate() over the ms array
        val meanFold = (0 until 16).map(b => s"mb$b")
          .foldLeft("0.0")((a, m) => s"($a + $m)")
        val sdFold = (0 until 16)
          .map(b => s"((mb$b - boot_mean) * (mb$b - boot_mean))")
          .foldLeft("0.0")((a, t) => s"($a + $t)")
        s"""WITH base AS (
           SELECT l_returnflag, floor(l_quantity * 100 + 0.5)::BIGINT AS q,
             md5(l_orderkey || '|' || l_linenumber || '|' ||
                 l_partkey || '|' || l_suppkey) AS dig
           FROM lineitem),
         w AS (
           SELECT l_returnflag, q,
             $wCols
           FROM base),
         reps AS (
           SELECT l_returnflag,
             $mbCols
           FROM w GROUP BY 1),
         m AS (
           SELECT l_returnflag, $mbList,
             $meanFold / 16.0 AS boot_mean
           FROM reps),
         sd AS (
           SELECT l_returnflag, boot_mean,
             sqrt($sdFold / 15.0) AS boot_sd
           FROM m)
         SELECT l_returnflag, boot_mean, boot_sd,
           boot_mean - 1.96 * boot_sd AS ci_lo,
           boot_mean + 1.96 * boot_sd AS ci_hi
         FROM sd ORDER BY l_returnflag"""
      }),

    // Wilson score interval for a per-segment proportion (share of
    // fulfilled orders) — the parametric partner of q_stats_bootstrap:
    // exact integer (successes, trials) per group into one shared IEEE
    // closed form; better coverage than the naive normal interval near
    // 0/1 and at small n. One combinable groupBy; the formula is
    // per-group scalar arithmetic.
    QueryDef("q_stats_wilson",
      (s, d) => {
        val z = lit(1.96)
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .as("k"))
          .select(col("segment"), col("n"), col("k"),
            (col("k").cast("double") / col("n").cast("double")).as("p"))
          .select(col("segment"), col("n"), col("k"), col("p"),
            ((col("p") + z * z / (lit(2.0) * col("n").cast("double"))) /
              (lit(1.0) + z * z / col("n").cast("double"))).as("center"),
            ((z / (lit(1.0) + z * z / col("n").cast("double"))) *
              sqrt(col("p") * (lit(1.0) - col("p")) / col("n").cast("double") +
                z * z / (lit(4.0) * col("n").cast("double") *
                  col("n").cast("double")))).as("halfwidth"))
          .select(col("segment"), col("n"), col("k"), col("p"),
            (col("center") - col("halfwidth")).as("wilson_lo"),
            (col("center") + col("halfwidth")).as("wilson_hi"))
          .orderBy("segment")
      },
      """WITH g AS (
           SELECT c_mktsegment AS segment, count(*) AS n,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS k
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1),
         p AS (SELECT segment, n, k, k::DOUBLE / n::DOUBLE AS p FROM g),
         w AS (
           SELECT segment, n, k, p,
             (p + 1.96 * 1.96 / (2.0 * n::DOUBLE))
               / (1.0 + 1.96 * 1.96 / n::DOUBLE) AS center,
             (1.96 / (1.0 + 1.96 * 1.96 / n::DOUBLE))
               * sqrt(p * (1.0 - p) / n::DOUBLE
                      + 1.96 * 1.96 / (4.0 * n::DOUBLE * n::DOUBLE))
               AS halfwidth
           FROM p)
         SELECT segment, n, k, p,
           center - halfwidth AS wilson_lo,
           center + halfwidth AS wilson_hi
         FROM w ORDER BY segment"""))
}
