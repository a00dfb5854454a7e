package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over relation-derived graphs — the pregel
  * family beyond connected components ([[graft.ops.Dedup.dedupClusters]]).
  *
  * PageRank here is INTEGER-DETERMINISTIC: ranks are BIGINT micro-units
  * (1e6 = mass 1.0), contributions are integral division `rank div
  * outdeg`, and damping is `(sum * 85) div 100` — every operation is
  * exact and order-independent, so the DuckDB oracle (the same three
  * rounds unrolled as CTEs) hash-matches bit-for-bit. Float PageRank
  * would be order-SENSITIVE in the per-node sum and unverifiable.
  *
  * Scale design (the CC pattern, [[graft.ops.Dedup]]): the edge list is
  * computed once behind a lazy checkpoint and re-joined each round —
  * per round, one join of the rank frame to edges on src (both sides
  * keyed on node ids, AQE picks the join), one map-side-combined
  * groupBy(dst) whose shuffle carries (node, partial-sum) longs, and
  * one left join back to the node set. Rank state per round is O(nodes)
  * longs; the plan is truncated per round by a lazy checkpoint so
  * driver-side re-analysis doesn't grow with iterations.
  */
object GraphOps {

  val defs: Seq[QueryDef] = Seq(
    // 3-round damped PageRank over the part↔supplier bipartite graph
    // (distinct lineitem pairs, both directions, so every node has
    // out-degree ≥ 1 and no dangling-mass handling is needed). Node
    // encoding: part → 2k, supplier → 2k+1 (disjoint by parity).
    QueryDef("q_graph_pagerank",
      (s, d) => {
        val pairs = Tables.lineitem(s, d).select(
          (col("l_partkey") * 2).as("p"),
          (col("l_suppkey") * 2 + 1).as("q")).distinct()
        val edges = pairs.select(col("p").as("src"), col("q").as("dst"))
          .union(pairs.select(col("q").as("src"), col("p").as("dst")))
          .localCheckpoint(eager = false)
        val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
          .localCheckpoint(eager = false)
        val nodes = edges.select(col("src").as("node")).distinct()
          .localCheckpoint(eager = false)
        var rank = nodes.withColumn("rank", lit(1000000L))
        for (_ <- 1 to 3) {
          val contribs = edges
            .join(rank.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
            .groupBy("node").agg(sum("c").as("in_mass"))
          rank = nodes.join(contribs, Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) + expr("(coalesce(in_mass, 0L) * 85) div 100"))
                .as("rank"))
            .localCheckpoint(eager = false)
        }
        rank.select(col("node").cast("long").as("node"),
            col("rank").cast("long").as("rank"))
          .orderBy("node")
      },
      """WITH pairs AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS q
                        FROM lineitem),
         edges AS (SELECT p AS src, q AS dst FROM pairs
                   UNION ALL SELECT q AS src, p AS dst FROM pairs),
         outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         nodes AS (SELECT DISTINCT src AS node FROM edges),
         r0 AS (SELECT node, 1000000 AS rank FROM nodes),
         c1 AS (SELECT e.dst AS node, sum(r.rank // o.outdeg) AS in_mass
                FROM edges e JOIN r0 r ON e.src = r.node
                JOIN outdeg o ON e.src = o.src GROUP BY 1),
         r1 AS (SELECT n.node, 150000 + (coalesce(c.in_mass, 0) * 85) // 100 AS rank
                FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
         c2 AS (SELECT e.dst AS node, sum(r.rank // o.outdeg) AS in_mass
                FROM edges e JOIN r1 r ON e.src = r.node
                JOIN outdeg o ON e.src = o.src GROUP BY 1),
         r2 AS (SELECT n.node, 150000 + (coalesce(c.in_mass, 0) * 85) // 100 AS rank
                FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
         c3 AS (SELECT e.dst AS node, sum(r.rank // o.outdeg) AS in_mass
                FROM edges e JOIN r2 r ON e.src = r.node
                JOIN outdeg o ON e.src = o.src GROUP BY 1),
         r3 AS (SELECT n.node, 150000 + (coalesce(c.in_mass, 0) * 85) // 100 AS rank
                FROM nodes n LEFT JOIN c3 c ON n.node = c.node)
         SELECT node::BIGINT AS node, rank::BIGINT AS rank
         FROM r3 ORDER BY node"""))
}
