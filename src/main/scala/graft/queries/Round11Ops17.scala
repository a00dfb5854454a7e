package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sharded

/** Round-11 batch 17: Spearman rank correlation (the tie-exact,
  * outlier-robust association readout — Pearson on midranks) and an
  * annealed mixture-weight schedule (the uniform→target interpolation
  * curricula use to ease a model into its final data mix).
  *
  * Scale shapes: Spearman's midranks come from the per-column VALUE
  * histograms — quantity's is 50 rows, price's is corpus-sized and its
  * prefix sum runs through Sharded.globalPrefixSum (price-range shards,
  * no unpartitioned window over a fact-sized frame); everything after
  * the rank joins is one combinable moment aggregate. The anneal is
  * |sources|×|epochs| arithmetic over one combinable count.
  */
object Round11Ops17 {

  val defs: Seq[QueryDef] = Seq(

    // Spearman ρ between l_quantity and l_extendedprice, exact under
    // ties: each value's midrank (doubled to stay integral:
    // 2·mr = 2·before + t + 1) comes from its column's histogram; ρ is
    // then Pearson on the doubled midranks — every moment
    // (Σx, Σy, Σx², Σy², Σxy) is a BIGINT sum over the fact table, and
    // the one float op is the final normalized division. The shared
    // 2× factor cancels in ρ.
    QueryDef("q_stats_spearman",
      (s, d) => {
        // NOT balanced (r17 optimization round, measured and rejected
        // TWICE): base feeds three branches that column-pruning
        // specializes to three DIFFERENT exchanges (q-only, p-only,
        // q+p), so a per-branch rebalance is not reused and each one
        // pays the keyless repartition's local sort — measured
        // 1.54 → 3.14 s. A single pinned rebalance (repartition +
        // eager localCheckpoint leaf serving all three consumers,
        // Tables.balancedPinned) was ALSO measured worse — 1.70 →
        // 2.75 s: the 600k-row exchange + materialization costs more
        // than the single-threaded partial aggs it parallelizes. The
        // plain shape stays.
        val base = Tables.lineitem(s, d)
          .select(col("l_quantity").cast("long").as("q"),
            col("l_extendedprice").as("p"))
        // quantity: ≤50 distinct values — plain tiny-histogram cumsum
        val qh = base.groupBy("q").agg(count(lit(1)).as("t"))
        val qr = Sharded.globalPrefixSum(qh, col("q") % lit(1L), Seq(col("q")),
            col("t"), "before")
          .select(col("q"), (lit(2) * col("before") + col("t") + lit(1)).as("rx"))
        // price: corpus-sized histogram — sharded prefix sum
        val ph = base.groupBy("p").agg(count(lit(1)).as("t"))
        val pr = Sharded.globalPrefixSum(ph,
            floor(col("p") / lit(10000.0)).cast("long"), Seq(col("p")),
            col("t"), "before")
          .select(col("p"), (lit(2) * col("before") + col("t") + lit(1)).as("ry"))
        // Second moments overflow BIGINT at scale (rx ≤ 2N, so Σrx² ~ 4N³:
        // the 10× profiler hit MathUtils.addExact at 6M rows) —
        // accumulate in DECIMAL(38,0) and emit DOUBLE casts (exact
        // round-to-nearest of the same decimal on both engines).
        base.join(broadcast(qr), "q").join(pr, "p")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("rx").cast("decimal(38,0)")).as("dsx"),
            sum(col("ry").cast("decimal(38,0)")).as("dsy"),
            sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("dsxx"),
            sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("dsyy"),
            sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("dsxy"))
          .select(col("n"),
            col("dsx").cast("double").as("sx"),
            col("dsy").cast("double").as("sy"),
            col("dsxx").cast("double").as("sxx"),
            col("dsyy").cast("double").as("syy"),
            col("dsxy").cast("double").as("sxy"))
          .withColumn("rho",
            expr("""(CAST(n AS DOUBLE) * sxy - sx * sy)
              / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                * (CAST(n AS DOUBLE) * syy - sy * sy))"""))
          .select("n", "sx", "sy", "sxy", "rho")
      },
      """WITH base AS (
        |  SELECT l_quantity::BIGINT AS q, l_extendedprice AS p FROM lineitem),
        |qh AS (SELECT q, count(*)::BIGINT AS t FROM base GROUP BY 1),
        |qr AS (
        |  SELECT q, (2 * coalesce(sum(t) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + t + 1)::BIGINT AS rx
        |  FROM qh),
        |ph AS (SELECT p, count(*)::BIGINT AS t FROM base GROUP BY 1),
        |pr AS (
        |  SELECT p, (2 * coalesce(sum(t) OVER (ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + t + 1)::BIGINT AS ry
        |  FROM ph),
        |moments AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(rx)::DOUBLE AS sx, sum(ry)::DOUBLE AS sy,
        |    sum(rx * rx)::DOUBLE AS sxx, sum(ry * ry)::DOUBLE AS syy,
        |    sum(rx * ry)::DOUBLE AS sxy
        |  FROM base JOIN qr USING (q) JOIN pr USING (p))
        |SELECT n, sx, sy, sxy,
        |  (n::DOUBLE * sxy - sx * sy)
        |    / sqrt((n::DOUBLE * sxx - sx * sx)
        |      * (n::DOUBLE * syy - sy * sy)) AS rho
        |FROM moments""".stripMargin),

    // Annealed mixture weights: epoch e of E interpolates each source's
    // sampling weight from uniform (1/|S|) to its corpus proportion
    // (n_s/N) with λ = e/(E−1): w = (1−λ)/|S| + λ·n_s/N. Integer-exact
    // numerators over the common denominator |S|·N·(E−1) would overflow
    // nothing here, but the float form is already deterministic — each
    // w is ONE expression over exact BIGINTs, identical on both engines.
    // Weights sum to 1 per epoch (up to float rounding; the spec pins
    // it to 1e-12).
    QueryDef("q_mix_anneal",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("ns"))
        val tot = counts.agg(sum("ns").as("n"),
          count(lit(1)).cast("long").as("k"))
        val epochs = s.range(0, 5).select(col("id").as("epoch"))
        counts.crossJoin(broadcast(tot)).crossJoin(broadcast(epochs))
          .select(col("epoch"), col("source"), col("ns").cast("long").as("n_source"),
            ((lit(1.0) - col("epoch").cast("double") / lit(4.0))
              / col("k").cast("double")
              + (col("epoch").cast("double") / lit(4.0))
                * col("ns").cast("double") / col("n").cast("double"))
              .as("weight"))
          .orderBy("epoch", "source")
      },
      """WITH counts AS (
        |  SELECT source, count(*)::BIGINT AS ns FROM documents GROUP BY 1),
        |tot AS (SELECT sum(ns)::BIGINT AS n, count(*)::BIGINT AS k FROM counts),
        |epochs AS (SELECT unnest(generate_series(0, 4))::BIGINT AS epoch)
        |SELECT epoch, source, ns AS n_source,
        |  (1.0 - epoch::DOUBLE / 4.0) / k::DOUBLE
        |    + (epoch::DOUBLE / 4.0) * ns::DOUBLE / n::DOUBLE AS weight
        |FROM counts, tot, epochs
        |ORDER BY epoch, source""".stripMargin),
  )
}
