package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.ops.HnswIndex
import Round15Ops2._

/** Round-17 batch 3 (the r16 verdict's stretch item): maintained-index
  * COMPACTION METRIC — after K incremental batches, how far has the
  * maintained index's recall drifted from a from-scratch build of the
  * same corpus? This is the "when to rebuild" signal every vector
  * store operates on (incremental maintenance accumulates local
  * placement decisions; a rebuild re-optimizes globally — the readout
  * says when that price is worth paying).
  *
  * Scenario (K = 2): the standing corpus is 80 % (vec_id % 10 ∉
  * {0, 5}); two batches arrive in sequence (% 10 = 0, then % 10 = 5),
  * each absorbed by [[graft.ops.HnswIndex.insert]] — the second batch
  * descends an index that already contains the first, so placement
  * error can COMPOUND, which is exactly what the metric watches. The
  * same 8 queries then search (a) the twice-maintained index and
  * (b) the from-scratch build over the identical final corpus; both
  * are graded against exact brute force and the per-query drift
  * (recall_inc − recall_scratch) is the emitted signal.
  *
  * The DuckDB mirror replays the ENTIRE 2-batch lifecycle — base
  * build, batch-1 descent + merge, rebuilt mid-point upper layers,
  * batch-2 descent + merge, both final searches, ground truth — so
  * the gate hashes the drift readout itself, at every SF, on every
  * run (measured at the gate corpora: drift = 0.0 on all 8 queries at
  * N=500; see Round17Spec4).
  *
  * Scale shape: two bounded insertion searches + the already-profiled
  * from-scratch build (staged under the bench's StageCache key, so
  * the family shares it); the drift join is 8 rows.
  */
object Round17Ops3 {

  private val B1 = 0 // first batch: vec_id % 10 == 0
  private val B2 = 5 // second batch: vec_id % 10 == 5

  private def drifted(s: SparkSession, d: String): DataFrame = {
    graft.functions.CosineSimExpr.register(s)
    val v = leveled(s, d).localCheckpoint(eager = true)
    val stand = v.filter(col("vec_id") % 10 =!= B1 && col("vec_id") % 10 =!= B2)
    val e0s = graft.ops.StageCache.keyed(s, s"hnsw_e0:base80:$d")(
      HnswIndex.buildE0(stand))
    val b1 = v.filter(col("vec_id") % 10 === B1).select("vec_id", "embedding")
    val b2 = v.filter(col("vec_id") % 10 === B2).select("vec_id", "embedding")
    // The twice-maintained standing layer 0 is staged under a content
    // key (r17 optimization round) — the same treatment the
    // incremental/delete/churn maintenance twins give their composed
    // standing state: the K-batch index is the persistent store
    // artifact; the drift READOUT below recomputes every run. Both
    // inserts live inside the build lambda so a cache hit constructs
    // neither (insert checkpoints eagerly at construction). Gate mode
    // (no cache dir) runs the full two-insert composition.
    val e02 = graft.ops.StageCache.keyed(s, s"hnsw_e0:drift$B1-$B2:$d") {
      val (v1, e01, _, _) = HnswIndex.insert(stand, e0s, b1)
      HnswIndex.insert(v1, e01, b2)._2
    }
    // The post-insert corpus is the FULL corpus (stand ∪ b1 ∪ b2 = v),
    // so the upper layers insert() rebuilds are content-equal to the
    // staged full-corpus layers the from-scratch side already reads
    // (layerEdges is deterministic in its input content) — search the
    // maintained index through those instead of rebuilding per run.
    val q = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val annInc = HnswIndex.topk(v, e02,
        stagedFullEdges(s, d, v, 1), stagedFullEdges(s, d, v, 2), q)
      .select(col("q_id"), col("neighbor_id"))
    // from-scratch over the same final corpus — the staged full
    // substrate q_similarity_hnsw itself searches
    val e0z = stagedFullEdges(s, d, v, 0)
    val e1z = stagedFullEdges(s, d, v, 1)
    val e2z = stagedFullEdges(s, d, v, 2)
    val annScr = HnswIndex.topk(v, e0z, e1z, e2z, q)
      .select(col("q_id"), col("neighbor_id"))
    // exact ground truth over the full corpus
    val bf = v.select(col("vec_id").as("nid"), col("embedding"))
      .join(broadcast(q), col("nid") =!= col("q_id"))
      .select(col("q_id"), col("nid"),
        qscore(col("embedding"), col("q_emb")).as("qs"))
    val wt = Window.partitionBy("q_id").orderBy(col("qs").desc, col("nid").asc)
    val truth = bf.withColumn("rn", row_number().over(wt))
      .filter(col("rn") <= TopK).select("q_id", "nid")
      .localCheckpoint(eager = true)
    def hitsOf(ann: DataFrame): DataFrame =
      truth.join(ann,
          truth("q_id") === ann("q_id") && truth("nid") === ann("neighbor_id"),
          "left")
        .select(truth("q_id").as("qid"), ann("neighbor_id").as("hit"))
        .groupBy("qid").agg(count(col("hit")).as("hits"))
    val hi = hitsOf(annInc).withColumnRenamed("hits", "hits_inc")
    val hz = hitsOf(annScr).withColumnRenamed("hits", "hits_scratch")
    hi.join(hz, "qid")
      .select(col("qid").as("q_id"),
        col("hits_inc"),
        (col("hits_inc").cast("double") / lit(TopK.toDouble)).as("recall_inc"),
        col("hits_scratch"),
        (col("hits_scratch").cast("double") / lit(TopK.toDouble))
          .as("recall_scratch"),
        ((col("hits_inc") - col("hits_scratch")).cast("double")
          / lit(TopK.toDouble)).as("drift"))
      .orderBy("q_id")
  }

  // ---------------- DuckDB mirror (generated from the same params) ----

  /** The insert-merge CTE triple: top-M out-links from the batch's
    * final scored pool s<lastHop><inSfx>, symmetrized into `baseE0`,
    * degrees re-capped — [[graft.ops.HnswIndex.insert]]'s merge step. */
  private[queries] def mergeCtes(inSfx: String, baseE0: String, outName: String): String =
    s"""newout$inSfx AS MATERIALIZED (
       |  SELECT src, dst, qs FROM (
       |    SELECT q_id AS src, node AS dst, qs,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY qs DESC, node ASC) AS rn
       |    FROM s$lastHop$inSfx WHERE node <> q_id)
       |  WHERE rn <= ${MOut(0)}),
       |mgp$inSfx AS MATERIALIZED (
       |  SELECT src, dst, max(qs) AS qs FROM (
       |    SELECT src, dst, qs FROM $baseE0
       |    UNION ALL
       |    SELECT src, dst, qs FROM newout$inSfx
       |    UNION ALL
       |    SELECT dst AS src, src AS dst, qs FROM newout$inSfx) z
       |  GROUP BY src, dst),
       |$outName AS MATERIALIZED (
       |  ${topMSql(s"mgp$inSfx", MTot(0))})""".stripMargin

  private[queries] def hopsFor(sfx: String, qn: String, layer0: String,
      upperSfx: String): String = {
    val hopList = Hops.flatMap { case (l, n, beam) => Seq.fill(n)((l, beam)) }
    hopList.zipWithIndex.map { case ((l, beam), i) =>
      hopCtes(i + 1, l, beam, sfx = sfx, qn = qn, layer0 = layer0,
        upperSfx = upperSfx) }.mkString(",\n")
  }

  private def driftCteBody: String = {
    val standing = s" AND vec_id % 10 NOT IN ($B1, $B2)"
    val afterB1 = s" AND vec_id % 10 <> $B2"
    s"""${Round16Ops.lvCte},
       |${edgeCtes(0, sfx = "b", extra = standing)},
       |${(1 to NndRounds).map(r => nndCtes(r, "b")).mkString(",\n")},
       |${edgeCtes(2, sfx = "m1", extra = afterB1)},
       |${edgeCtes(1, sfx = "m1", extra = afterB1)},
       |qi1 AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM lv
       |       WHERE vec_id % 10 = $B1),
       |ep1 AS MATERIALIZED (SELECT vec_id AS node FROM lv
       |       WHERE vec_id % 10 <> $B2
       |       ORDER BY lvl DESC, vec_id ASC LIMIT 1),
       |f0i1 AS MATERIALIZED (SELECT q_id, node FROM qi1 CROSS JOIN ep1),
       |${hopsFor("i1", "qi1", s"e0br$NndRounds", "m1")},
       |${mergeCtes("i1", s"e0br$NndRounds", "e0m1")},
       |${edgeCtes(2)},
       |${edgeCtes(1)},
       |qi2 AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM lv
       |       WHERE vec_id % 10 = $B2),
       |ep AS MATERIALIZED (SELECT vec_id AS node FROM lv
       |       ORDER BY lvl DESC, vec_id ASC LIMIT 1),
       |f0i2 AS MATERIALIZED (SELECT q_id, node FROM qi2 CROSS JOIN ep),
       |${hopsFor("i2", "qi2", "e0m1", "")},
       |${mergeCtes("i2", "e0m1", "e0m2")},
       |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM lv
       |      WHERE vec_id < $NQueries),
       |f0m AS MATERIALIZED (SELECT q_id, node FROM q CROSS JOIN ep),
       |${hopsFor("m", "q", "e0m2", "")},
       |${edgeCtes(0)},
       |${(1 to NndRounds).map(r => nndCtes(r)).mkString(",\n")},
       |f0z AS MATERIALIZED (SELECT q_id, node FROM q CROSS JOIN ep),
       |${hopsFor("z", "q", s"e0r$NndRounds", "")}""".stripMargin
  }

  private def driftOracle: String =
    s"""WITH $driftCteBody,
       |annm AS MATERIALIZED (
       |  SELECT q_id, node AS neighbor_id FROM (
       |    SELECT q_id, node, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn
       |    FROM s${lastHop}m WHERE node <> q_id)
       |  WHERE rn <= $TopK),
       |annz AS MATERIALIZED (
       |  SELECT q_id, node AS neighbor_id FROM (
       |    SELECT q_id, node, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn
       |    FROM s${lastHop}z WHERE node <> q_id)
       |  WHERE rn <= $TopK),
       |bf AS MATERIALIZED (
       |  SELECT q.q_id, e.vec_id AS nid,
       |    floor((${Similarity.cosineSql("e.embedding", "q.q_emb")}) * 1e9)::BIGINT AS qs
       |  FROM lv e JOIN q ON e.vec_id <> q.q_id),
       |bft AS MATERIALIZED (
       |  SELECT q_id, nid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, nid ASC) AS rn FROM bf)
       |  WHERE rn <= $TopK),
       |hm AS MATERIALIZED (
       |  SELECT t.q_id, count(a.neighbor_id)::BIGINT AS hits
       |  FROM bft t LEFT JOIN annm a
       |    ON t.q_id = a.q_id AND t.nid = a.neighbor_id
       |  GROUP BY t.q_id),
       |hz AS MATERIALIZED (
       |  SELECT t.q_id, count(a.neighbor_id)::BIGINT AS hits
       |  FROM bft t LEFT JOIN annz a
       |    ON t.q_id = a.q_id AND t.nid = a.neighbor_id
       |  GROUP BY t.q_id)
       |SELECT hm.q_id, hm.hits AS hits_inc,
       |  hm.hits / $TopK.0 AS recall_inc,
       |  hz.hits AS hits_scratch,
       |  hz.hits / $TopK.0 AS recall_scratch,
       |  (hm.hits - hz.hits) / $TopK.0 AS drift
       |FROM hm JOIN hz ON hm.q_id = hz.q_id
       |ORDER BY hm.q_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_similarity_hnsw_drift",
      (s, d) => drifted(s, d),
      driftOracle))
}
