package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.ops.HnswIndex
import Round15Ops2._

/** Round-17 batch 2: the ANN DELETE path — the other half of index
  * maintenance next to q_similarity_hnsw_incremental's insert (r16).
  * A production vector store doesn't only grow: documents get taken
  * down, embeddings get re-computed, GDPR erasure lands as tombstone
  * batches — and dropping rows from a NAVIGABLE graph is not a filter,
  * because deleted nodes carried paths (severing them un-reaches their
  * neighborhoods) and survivors' neighbor lists hold dangling edges.
  *
  * Scenario: the standing index is the from-scratch build over the
  * full corpus (the r15 q_similarity_hnsw graph); vectors with
  * vec_id % 10 = 9 arrive as a tombstone batch (10 %, disjoint from
  * the 8 query ids). [[graft.ops.HnswIndex.remove]] drops them —
  * filter the vector table, drop edges touching tombstones, RE-LINK
  * every surviving source that lost a neighbor through the deleted
  * node's own surviving adjacency (the standard HNSW tombstone
  * repair), re-cap degrees, rebuild the geometric upper layers over
  * the survivors. The same 8 query vectors then search the repaired
  * index, and the recall twin grades it against exact brute force
  * over the SURVIVING corpus on every gate run.
  *
  * The DuckDB mirror replays the whole lifecycle — full-corpus base
  * build (the r15 CTEs verbatim), tombstone filter, lost-edge bridge
  * join, repair rescore, merge + re-cap, survivor upper layers,
  * final search — so the hash gate checks the repaired index
  * edge-for-edge, not an idealization.
  */
object Round17Ops2 {

  /** Tombstones: vec_id % TombMod == TombRem (disjoint from the 8
    * query ids 0–7, which are never deleted). */
  private val TombMod = 10
  private val TombRem = 9

  /** Build-standing + delete-batch + search, shared by the top-K query
    * and its recall readout: returns (surviving vectors, top-K). */
  private def afterDelete(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    graft.functions.CosineSimExpr.register(s)
    val v = leveled(s, d).localCheckpoint(eager = true)
    val ts = v.filter(col("vec_id") % TombMod === TombRem).select("vec_id")
    val v2 = v.join(ts, Seq("vec_id"), "left_anti")
      .localCheckpoint(eager = true)
    // The whole REPAIRED layer 0 is identical for this query and its
    // recall twin — staged under one key in bench mode so the second
    // caller skips the full-corpus standing build AND the tombstone
    // repair (plain build at the gate). The standing layer 0 it
    // repairs is the same staged substrate as q_similarity_hnsw.
    val e0d = graft.ops.StageCache.keyed(s, s"hnsw_e0:del$TombMod-$TombRem:$d")(
      HnswIndex.remove(v, stagedFullEdges(s, d, v, 0), ts)._2)
    // survivor upper layers: ≤ N/4 + N/16 nodes, rebuilt like remove()
    // rebuilds them (content-identical — the geometric tail is cheap)
    val e1d = layerEdges(v2, 1)
    val e2d = layerEdges(v2, 2)
    val q = v2.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    (v2, HnswIndex.topk(v2, e0d, e1d, e2d, q))
  }

  // ---------------- DuckDB mirror (generated from the same params) ----

  /** Every CTE through the final scored pool s<lastHop>s: full-corpus
    * layer-0 build + NN-descent (the r15 CTEs verbatim), tombstone
    * delete + repair (suffix d), survivor upper layers (suffix d),
    * final 8-query search (suffix s) over (e0d, e1d, e2d). */
  /** Tombstone-repair CTE block against an arbitrary standing layer-0
    * CTE `baseE0` — [[graft.ops.HnswIndex.remove]]'s dataflow
    * (keep / lost-edge bridge / rescore / merge / re-cap), emitting
    * `outName`. `survivors` must name a CTE holding the post-delete
    * vector table (vec_id, embedding, lvl). Shared by the delete pair
    * here and the interleaved churn lifecycle (Round17Ops4). */
  private[queries] def removeCtes(baseE0: String, survivors: String,
      tombMod: Int, tombRem: Int, outName: String, sfx: String = "d"): String =
    s"""keep$sfx AS MATERIALIZED (
       |  SELECT src, dst, qs FROM $baseE0
       |  WHERE src % $tombMod <> $tombRem AND dst % $tombMod <> $tombRem),
       |lost$sfx AS MATERIALIZED (
       |  SELECT src, dst AS mid FROM $baseE0
       |  WHERE src % $tombMod <> $tombRem AND dst % $tombMod = $tombRem),
       |cand$sfx AS MATERIALIZED (
       |  SELECT DISTINCT l.src, b.dst FROM lost$sfx l
       |  JOIN $baseE0 b ON l.mid = b.src
       |  WHERE b.dst <> l.src AND b.dst % $tombMod <> $tombRem),
       |rep$sfx AS MATERIALIZED (
       |  SELECT c.src, c.dst,
       |    floor((${Similarity.cosineSql("x.embedding", "y.embedding")}) * 1e9)::BIGINT AS qs
       |  FROM cand$sfx c JOIN $survivors x ON c.src = x.vec_id
       |               JOIN $survivors y ON c.dst = y.vec_id),
       |mrg$sfx AS MATERIALIZED (
       |  SELECT src, dst, max(qs) AS qs FROM (
       |    SELECT src, dst, qs FROM keep$sfx
       |    UNION ALL
       |    SELECT src, dst, qs FROM rep$sfx) z
       |  GROUP BY src, dst),
       |$outName AS MATERIALIZED (
       |  ${topMSql(s"mrg$sfx", MTot(0))})""".stripMargin

  private def delCteBody: String = {
    val hopList = Hops.flatMap { case (l, n, beam) => Seq.fill(n)((l, beam)) }
    val finHops = hopList.zipWithIndex.map { case ((l, beam), i) =>
      hopCtes(i + 1, l, beam, sfx = "s", qn = "q", layer0 = "e0d",
        upperSfx = "d") }
    val nnd = (1 to NndRounds).map(r => nndCtes(r))
    val alive = s" AND vec_id % $TombMod <> $TombRem"
    s"""${Round16Ops.lvCte},
       |${edgeCtes(0)},
       |${nnd.mkString(",\n")},
       |lvr AS MATERIALIZED (
       |  SELECT * FROM lv WHERE vec_id % $TombMod <> $TombRem),
       |${removeCtes(s"e0r$NndRounds", "lvr", TombMod, TombRem, "e0d")},
       |${edgeCtes(2, sfx = "d", extra = alive)},
       |${edgeCtes(1, sfx = "d", extra = alive)},
       |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM lvr
       |      WHERE vec_id < $NQueries),
       |ep AS MATERIALIZED (SELECT vec_id AS node FROM lvr
       |       ORDER BY lvl DESC, vec_id ASC LIMIT 1),
       |f0s AS MATERIALIZED (SELECT q_id, node FROM q CROSS JOIN ep),
       |${finHops.mkString(",\n")}""".stripMargin
  }

  private def delOracle: String =
    s"""WITH $delCteBody
       |SELECT q_id, rn::BIGINT AS rn, neighbor_id, qs AS qscore FROM (
       |  SELECT q_id, node AS neighbor_id, qs,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn
       |  FROM s${lastHop}s WHERE node <> q_id)
       |WHERE rn <= $TopK ORDER BY q_id, rn""".stripMargin

  /** Recall mirror: the same post-delete CTEs plus exact brute-force
    * top-K ground truth over the SURVIVING corpus. */
  private def delRecallOracle: String =
    s"""WITH $delCteBody,
       |ann AS MATERIALIZED (
       |  SELECT q_id, node AS neighbor_id FROM (
       |    SELECT q_id, node, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn
       |    FROM s${lastHop}s WHERE node <> q_id)
       |  WHERE rn <= $TopK),
       |bf AS MATERIALIZED (
       |  SELECT q.q_id, e.vec_id AS nid,
       |    floor((${Similarity.cosineSql("e.embedding", "q.q_emb")}) * 1e9)::BIGINT AS qs
       |  FROM lvr e JOIN q ON e.vec_id <> q.q_id),
       |bft AS MATERIALIZED (
       |  SELECT q_id, nid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, nid ASC) AS rn FROM bf)
       |  WHERE rn <= $TopK)
       |SELECT t.q_id, count(a.neighbor_id)::BIGINT AS hits,
       |  count(a.neighbor_id)::DOUBLE / $TopK.0 AS recall
       |FROM bft t LEFT JOIN ann a
       |  ON t.q_id = a.q_id AND t.nid = a.neighbor_id
       |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_similarity_hnsw_delete",
      (s, d) => afterDelete(s, d)._2.orderBy("q_id", "rn"),
      delOracle),

    // Recall@10 of the REPAIRED index vs exact brute force over the
    // surviving corpus — the q_similarity_hnsw_recall discipline
    // applied to the delete path, so the gate grades the tombstone
    // repair's quality claim on every run at every SF. Round17Spec3
    // pins the absolute bar and the repair invariants.
    //
    // Scale shape: brute-force side is the allowlisted broadcast
    // 8-query fan-out (the calibration-query class); everything else
    // is the repaired index the main query already builds.
    QueryDef("q_similarity_hnsw_delete_recall",
      (s, d) => {
        val (v2, top) = afterDelete(s, d)
        val ann = top.select(col("q_id"), col("neighbor_id"))
        val q = v2.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val bf = v2.select(col("vec_id").as("nid"), col("embedding"))
          .join(broadcast(q), col("nid") =!= col("q_id"))
          .select(col("q_id"), col("nid"),
            qscore(col("embedding"), col("q_emb")).as("qs"))
        val wt = Window.partitionBy("q_id").orderBy(col("qs").desc, col("nid").asc)
        val truth = bf.withColumn("rn", row_number().over(wt))
          .filter(col("rn") <= TopK).select("q_id", "nid")
        truth.join(ann,
            truth("q_id") === ann("q_id") && truth("nid") === ann("neighbor_id"),
            "left")
          .select(truth("q_id").as("qid"), ann("neighbor_id").as("hit"))
          .groupBy("qid")
          .agg(count(col("hit")).as("hits"))
          .select(col("qid").as("q_id"), col("hits"),
            (col("hits").cast("double") / lit(TopK.toDouble)).as("recall"))
          .orderBy("q_id")
      },
      delRecallOracle))
}
