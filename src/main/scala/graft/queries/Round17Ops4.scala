package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.HnswIndex
import Round15Ops2._

/** Round-17 batch 4: the INTERLEAVED maintenance lifecycle — CHURN.
  * Rounds 16–17 proved each half of ANN index maintenance in
  * isolation (insert = search, delete = filter + bounded repair);
  * a production vector store runs BOTH, in sequence, against the same
  * standing state: documents arrive, documents get erased, and the
  * index the next query searches is the composition of the two
  * maintenance paths — including their interaction (the tombstone
  * repair must re-link through edges the INSERT created, and inserted
  * nodes that pointed at tombstones must be repaired like any
  * standing node).
  *
  * Scenario: the standing corpus is 90 % (vec_id % 10 ≠ 0 — the r16
  * incremental split, so phase 1 IS the q_similarity_hnsw_incremental
  * lifecycle and shares its staged substrate in bench mode); the
  * % 10 = 0 batch is absorbed by [[graft.ops.HnswIndex.insert]]; then
  * vectors with vec_id % 10 = 9 arrive as a tombstone batch and
  * [[graft.ops.HnswIndex.remove]] repairs the POST-INSERT index. The
  * same 8 query vectors (ids 0–7 — id 0 is itself an inserted node)
  * then search the churned index.
  *
  * The DuckDB mirror replays the full composition — 90 % base build +
  * NN-descent, full-corpus upper layers, batch descent + merge +
  * re-cap (the incremental CTEs), tombstone filter + bridge-join
  * repair + re-cap AGAINST THE MERGED LAYER 0 (the delete CTEs,
  * parametrized on e0m), survivor upper layers, final search — so the
  * hash gate checks the composed maintenance result edge-for-edge at
  * every SF, on every run.
  *
  * Scale shape: the composition adds nothing beyond its parts — one
  * bounded insertion search (hops·beam·M_tot per batch vector), one
  * bounded repair (O(|lost|·M_tot) via the mid-point bridge join),
  * three partial-agg merges; every step linear in the standing state.
  * Round17Spec5 pins the churned index's recall@10 ≥ 0.90 vs exact
  * brute force over the surviving corpus and the composition
  * invariants (no tombstone edge survives, degrees capped).
  */
object Round17Ops4 {

  /** Insert batch: vec_id % BatchMod == 0 (the r16 incremental split —
    * phase 1 is shared state with q_similarity_hnsw_incremental). */
  private val BatchMod = 10

  /** Tombstones arrive AFTER the insert: vec_id % TombMod == TombRem
    * (standing members, disjoint from the batch and the 8 query ids). */
  private val TombMod = 10
  private val TombRem = 9

  private def churned(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    graft.functions.CosineSimExpr.register(s)
    val v = leveled(s, d).localCheckpoint(eager = true)
    // phase 1 — the incremental pair's maintained layer 0, staged
    // under the SAME key (bench mode shares one build across the
    // incremental pair and this query; plain build at the gate)
    val e0m = graft.ops.StageCache.keyed(s, s"hnsw_e0:maint$BatchMod:$d") {
      val base = v.filter(col("vec_id") % BatchMod =!= 0)
      val e0b = graft.ops.StageCache.keyed(s, s"hnsw_e0:base$BatchMod:$d")(
        HnswIndex.buildE0(base))
      val batch = v.filter(col("vec_id") % BatchMod === 0)
        .select("vec_id", "embedding")
      HnswIndex.insert(base, e0b, batch)._2
    }
    // phase 2 — tombstone repair against the post-insert index
    val ts = v.filter(col("vec_id") % TombMod === TombRem).select("vec_id")
    val v3 = v.join(ts, Seq("vec_id"), "left_anti")
      .localCheckpoint(eager = true)
    val e0c = graft.ops.StageCache.keyed(
      s, s"hnsw_e0:churn$BatchMod-$TombRem:$d")(
      HnswIndex.remove(v, e0m, ts)._2)
    val e1c = layerEdges(v3, 1)
    val e2c = layerEdges(v3, 2)
    val q = v3.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    (v3, HnswIndex.topk(v3, e0c, e1c, e2c, q))
  }

  // ---------------- DuckDB mirror (generated from the same params) ----

  private def churnCteBody: String = {
    val standing = s" AND vec_id % $BatchMod <> 0"
    val alive = s" AND vec_id % $TombMod <> $TombRem"
    s"""${Round16Ops.lvCte},
       |${edgeCtes(0, sfx = "b", extra = standing)},
       |${(1 to NndRounds).map(r => nndCtes(r, "b")).mkString(",\n")},
       |${edgeCtes(2)},
       |${edgeCtes(1)},
       |qi AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM lv
       |      WHERE vec_id % $BatchMod = 0),
       |ep AS MATERIALIZED (SELECT vec_id AS node FROM lv
       |       ORDER BY lvl DESC, vec_id ASC LIMIT 1),
       |f0i AS MATERIALIZED (SELECT q_id, node FROM qi CROSS JOIN ep),
       |${Round17Ops3.hopsFor("i", "qi", s"e0br$NndRounds", "")},
       |${Round17Ops3.mergeCtes("i", s"e0br$NndRounds", "e0m")},
       |lvr AS MATERIALIZED (
       |  SELECT * FROM lv WHERE vec_id % $TombMod <> $TombRem),
       |${Round17Ops2.removeCtes("e0m", "lvr", TombMod, TombRem, "e0c",
             sfx = "c")},
       |${edgeCtes(2, sfx = "d", extra = alive)},
       |${edgeCtes(1, sfx = "d", extra = alive)},
       |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM lvr
       |      WHERE vec_id < $NQueries),
       |ep2 AS MATERIALIZED (SELECT vec_id AS node FROM lvr
       |       ORDER BY lvl DESC, vec_id ASC LIMIT 1),
       |f0s AS MATERIALIZED (SELECT q_id, node FROM q CROSS JOIN ep2),
       |${Round17Ops3.hopsFor("s", "q", "e0c", "d")}""".stripMargin
  }

  private def churnOracle: String =
    s"""WITH $churnCteBody
       |SELECT q_id, rn::BIGINT AS rn, neighbor_id, qs AS qscore FROM (
       |  SELECT q_id, node AS neighbor_id, qs,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn
       |  FROM s${lastHop}s WHERE node <> q_id)
       |WHERE rn <= $TopK ORDER BY q_id, rn""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_similarity_hnsw_churn",
      (s, d) => churned(s, d)._2.orderBy("q_id", "rn"),
      churnOracle))
}
