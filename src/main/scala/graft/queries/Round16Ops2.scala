package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-16 batch 2 (labelprop variant re-pointed in round 17): delta
  * propagation for iterative graph rounds — the Pregel halting idiom
  * (per round, persist only CHANGED pairs; recompute only nodes with a
  * changed in-neighbor), in two variants where it genuinely pays:
  *
  *   - q_graph_labelprop_delta — frequency-argmax label propagation
  *     under a SEMI-SYNCHRONOUS schedule (Raghavan et al. §3's
  *     two-coloring: odd rounds update the odd side, even rounds the
  *     even side). The r16 original ran the SYNCHRONOUS schedule and
  *     measured the known bipartite 2-cycle — Δ = N every round, the
  *     honest negative result (sync delta exactness is still pinned by
  *     Round17Spec2 against the classic loop); the r16 verdict asked
  *     for the re-point at a CONVERGING instance. The alternating
  *     schedule breaks the 2-cycle by construction, and on the
  *     thresholded ≥2-co-occurrence graph (the q_graph_components
  *     corpus) deltas shrink to EMPTY: measured (ProfDelta17)
  *     10→199→0 at sf0.001 (3 rounds), 100→1933→…→0 at sf0.01 (9),
  *     1000→6488→14→33→0 at sf0.1 (5). The loop caps at
  *     [[LpMaxRounds]] rounds (mirrored by the unrolled oracle) and
  *     exits exactly at the first empty delta: Δᵢ = ∅ means the
  *     updating side recomputed from inputs unchanged since its last
  *     update, so every later round is the identity.
  *   - q_graph_components (below) — the MONOTONE propagation where
  *     the same idiom pays via shrink-to-empty, r16's headline.
  *
  * Delta exactness for the semi-sync schedule: a node recomputes from
  * the OPPOSITE side's labels, which last changed in the previous
  * round — so recomputing only nodes adjacent to Δᵢ₋₁ cannot miss an
  * update. Rounds 1–2 recompute their full sides through the same
  * rule: Δ₀ = base (all nodes), and round 1 changes EVERY odd node
  * (labels start as own ids; an odd node's candidates are all even
  * neighbor ids, so its label must move), hence Δ₁ = the whole odd
  * side and round 2's affected set is the whole even side.
  *
  * Shared mechanics: round state = Δᵢ, the only frame
  * [[graft.ops.RoundState]] persists; current labels are never
  * persisted — curᵢ folds from the checkpointed leaves (base ∪ Δ₁…Δᵢ)
  * with one partial-agg groupBy, O(N + ΣΔ) rows through one shuffle,
  * plan depth CONSTANT in the round count (every input is a
  * checkpoint leaf, so AQE re-planning cannot compound — the r13
  * lineage rule). Per round the edge table is probed once with a hash
  * semi-join on dst (no reshuffle of the edge side — it stays
  * repartition(src)-checkpointed exactly like the classic loop) and
  * only edges INTO affected nodes reach the aggregation shuffle.
  */
object Round16Ops2 {

  private val LpMaxRounds = 12
  private val CcMaxRounds = 20

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_graph_labelprop_delta",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // the thresholded ≥2-co-occurrence graph (the q_graph_components
        // corpus): the strong-co-occurrence communities an analyst
        // actually wants, and the instance where the delta idiom pays
        val pairs = li
          .groupBy((col("l_partkey") * 2).as("p"),
            (col("l_suppkey") * 2 + 1).as("q"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
          .select("p", "q")
        // RoundState.edge: the per-frame disk override for the O(E)
        // substrate (spark.graft.graph.edgeState=disk) — default
        // identical to of(); see SCALING.md round-17 isolation
        val edges = graft.ops.RoundState.edge(
          pairs.select(col("p").as("src"), col("q").as("dst"))
            .union(pairs.select(col("q").as("src"), col("p").as("dst")))
            .repartition(col("src")))
        // base labels (round 0): every node its own label — the last
        // full-width frame this query ever materializes
        val base = graft.ops.RoundState.pinned(
          edges.select(col("src").as("node")).distinct()
            .withColumn("label", col("node")))
        // Δ₀ = base (round 1's affected set = the whole odd side)
        var delta = base
        // checkpointed leaves the current-label view is folded from
        var pieces = Vector(base.withColumn("r", lit(0)))
        def cur(): DataFrame = pieces.reduce(_ unionByName _)
          .groupBy("node")
          .agg(max_by(col("label"), col("r")).as("label"))
        var round = 0
        var converged = false
        while (round < LpMaxRounds && !converged) {
          round += 1
          // semi-synchronous two-coloring: odd rounds update odd nodes
          // (suppliers, 2k+1), even rounds even nodes (parts, 2k) —
          // breaks the bipartite 2-cycle the sync schedule oscillates on
          val side = round % 2
          val affected = edges
            .join(delta.select(col("node").as("src")), "src")
            .select(col("dst").as("node")).distinct()
            .filter(col("node") % 2 === side)
          val curLabels = cur()
          val recomputed = edges
            .join(affected.withColumnRenamed("node", "dst"), Seq("dst"),
              "left_semi")
            .join(curLabels.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node"), col("label"))
            .agg(count(lit(1)).as("c"))
            .groupBy("node")
            // identical argmax to the classic loop: most frequent label,
            // tie to the smallest id — one combinable aggregate
            .agg(min_by(col("label"),
              struct((-col("c")).as("nc"), col("label"))).as("label"))
          // Δᵢ = recomputed nodes whose label actually moved; the ONLY
          // frame this round persists
          val nextDelta = recomputed.as("n")
            .join(curLabels.as("o"), col("n.node") === col("o.node"))
            .filter(col("n.label") =!= col("o.label"))
            .select(col("n.node").as("node"), col("n.label").as("label"))
          // RoundState.pinned, NOT next()/of(): Δᵢ₋₁ stays a live
          // leaf of every later cur() fold (freeing it would re-open
          // the lineage the pin exists to truncate), and pinned()
          // dodges the LogicalRDD originConstraints bug a checkpointed
          // frame triggers under the cur() union (see RoundState
          // scaladoc). Live state is ΣΔ, shrinking per round on this
          // converging schedule (ProfDelta17 measurements above)
          delta = graft.ops.RoundState.pinned(nextDelta)
          pieces = pieces :+ delta.withColumn("r", lit(round))
          // Δᵢ = ∅: the updating side recomputed from inputs unchanged
          // since its last update → every later round is the identity
          // (exact early exit; the oracle's remaining unrolled rounds
          // are no-ops on the same labels)
          converged = delta.limit(1).isEmpty
        }
        cur().orderBy("node")
      },
      // the semi-synchronous semantics unrolled to the cap — delta
      // propagation is an execution strategy, not a semantics change;
      // every CTE MATERIALIZED (l(i-1) is referenced twice per round —
      // the r15 DuckDB inlining fd-blowup lesson)
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS q
         |  FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2),
         |edges AS MATERIALIZED (
         |  SELECT p AS src, q AS dst FROM pairs
         |  UNION ALL SELECT q AS src, p AS dst FROM pairs),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges),
         |${(1 to LpMaxRounds).map(i =>
             s"""c$i AS MATERIALIZED (
                |  SELECT e.dst AS node, l.label, count(*) AS c
                |  FROM edges e JOIN l${i - 1} l ON e.src = l.node
                |  WHERE e.dst % 2 = ${i % 2}
                |  GROUP BY 1, 2),
                |u$i AS MATERIALIZED (
                |  SELECT node, label FROM (
                |    SELECT node, label, row_number() OVER (
                |      PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                |    FROM c$i) WHERE rn = 1),
                |l$i AS MATERIALIZED (
                |  SELECT node, label FROM l${i - 1} WHERE node % 2 <> ${i % 2}
                |  UNION ALL
                |  SELECT node, label FROM u$i)""".stripMargin)
            .mkString(",\n")}
         |SELECT node, label FROM l$LpMaxRounds ORDER BY node""".stripMargin),

    // Connected components via MIN-LABEL propagation — the graph
    // operator where the halting idiom genuinely pays, because the
    // update is MONOTONE (labels only decrease), so the changed set
    // shrinks to EMPTY and stays there: measured deltas on the
    // thresholded graph at sf0.1: 7 260 → 2 169 → 4 876 → … → 91 → 0
    // after 18 rounds; sf0.001/sf0.01 converge in 3/5. The loop runs a
    // fixed cap of 20 rounds (mirrored by the unrolled oracle) but
    // EXITS at the first empty delta — exact, because an empty delta is
    // a fixpoint of a monotone update: every later unrolled round is
    // the identity, so "stop early" and "run all 20" are the same
    // labels. Cost therefore tracks ACTUAL convergence, not the cap —
    // on an already-converged corpus the round costs nothing.
    //
    // Graph: part↔supplier pairs co-occurring on ≥2 lineitems (the
    // threshold fragments the giant component into 44 real components
    // at sf0.1 — the "strong co-occurrence" graph an analyst actually
    // clusters). Per-round work is bounded by the DELTA: the incoming
    // min is computed from changed sources only (exact under the
    // monotone update — see the round-body note), and the label frame
    // is maintained with one Δ-broadcast left join per round.
    QueryDef("q_graph_components",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val pairs = li
          .groupBy((col("l_partkey") * 2).as("p"),
            (col("l_suppkey") * 2 + 1).as("q"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
          .select("p", "q")
        // RoundState.edge: the per-frame disk override for the O(E)
        // substrate (spark.graft.graph.edgeState=disk) — default
        // identical to of(); see SCALING.md round-17 isolation
        val edges = graft.ops.RoundState.edge(
          pairs.select(col("p").as("src"), col("q").as("dst"))
            .union(pairs.select(col("q").as("src"), col("p").as("dst")))
            .repartition(col("src")))
        val base = graft.ops.RoundState.of(
          edges.select(col("src").as("node")).distinct()
            .withColumn("label", col("node")))
        // r17 optimization-round rewrite of the round body — same labels
        // per round, bit-for-bit (oracle unchanged, re-gated at all three
        // SFs), two structural changes:
        //   1. DELTA-ONLY propagation: the min incoming label for a node
        //      is computed from CHANGED sources only. Exact for a
        //      monotone min update: an unchanged neighbor u last changed
        //      in some round r', dst absorbed u's label in round r'+1 and
        //      labels only decrease, so u cannot improve dst now. This
        //      deletes the old per-round `affected` distinct + left_semi
        //      + full-labels join — per-round join work drops from
        //      O(Σdeg(affected)) rows against an O(N) label fold to
        //      O(Σdeg(Δ)) rows against Δ itself (guide §2.3/§2.4).
        //   2. MAINTAINED label frame instead of the base ∪ Δ₁ … Δᵢ
        //      union fold: the fold re-unioned a growing list of
        //      checkpoint leaves and was executed TWICE per round (nbMin
        //      + diff sides); the maintained frame is one left join +
        //      coalesce per round (Δ broadcasts, labels' partitioning is
        //      preserved — no shuffle). No frame lands under a Union
        //      anymore, so the plain eager checkpoint replaces
        //      RoundState.pinned and its per-use Row-conversion pass.
        var labels = base
        var delta = base
        var round = 0
        var converged = false
        while (round < CcMaxRounds && !converged) {
          round += 1
          // min incoming label from changed sources only
          val nbMin = edges
            .join(delta.select(col("node").as("src"), col("label").as("lsrc")),
              "src")
            .groupBy(col("dst").as("node")).agg(min("lsrc").as("nb"))
          val nextDelta = nbMin.as("n")
            .join(labels.as("o"), col("n.node") === col("o.node"))
            .filter(col("n.nb") < col("o.label"))
            .select(col("n.node").as("node"), col("n.nb").as("label"))
          delta = graft.ops.RoundState.of(nextDelta)
          // fold Δ into the maintained labels: coalesce == min because
          // every Δ row won the nb < label filter above
          labels = graft.ops.RoundState.next(
            labels.as("l").join(delta.as("dl"), Seq("node"), "left")
              .select(col("node"),
                coalesce(col("dl.label"), col("l.label")).as("label")),
            labels)
          // empty Δ = fixpoint of a monotone update: the remaining
          // unrolled oracle rounds are the identity — exact early exit
          converged = delta.limit(1).isEmpty
        }
        labels.select(col("node"), col("label").as("component"))
          .orderBy("node")
      },
      // every CTE MATERIALIZED: l(i-1) is referenced twice per round
      // (self ∪ neighbor join), so DuckDB's default inlining would
      // expand 2^rounds references to the parquet — the r15 fd-blowup
      // lesson, emitted at the construction site per the r16 ADVICE fix
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS q
         |  FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2),
         |edges AS MATERIALIZED (
         |  SELECT p AS src, q AS dst FROM pairs
         |  UNION ALL SELECT q AS src, p AS dst FROM pairs),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges),
         |${(1 to CcMaxRounds).map(i =>
             s"""l$i AS MATERIALIZED (
                |  SELECT node, min(label) AS label FROM (
                |    SELECT node, label FROM l${i - 1}
                |    UNION ALL
                |    SELECT e.dst AS node, l.label FROM edges e
                |    JOIN l${i - 1} l ON e.src = l.node) z
                |  GROUP BY node)""".stripMargin)
            .mkString(",\n")}
         |SELECT node, label AS component FROM l$CcMaxRounds
         |ORDER BY node""".stripMargin))

}
