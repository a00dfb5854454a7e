package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Round-15 batch 2: graph-based ANN — the navigable-graph family
  * member (HNSW-style) that completes the similarity suite next to
  * LSH (q_similarity_ann*), IVF (q_similarity_ivf*), PQ/IVFPQ and
  * hamming rescoring. Production vector serving overwhelmingly runs
  * graph indexes (HNSW/DiskANN); this is that shape made relational,
  * deterministic, and cross-engine checkable.
  *
  * Index build (all relational, all bounded):
  *   - LEVELS: P(level ≥ l) = 4^-l, assigned from the md5↔BIGINT
  *     bridge (ops/Dedup discipline) — h = low-32-bits of
  *     md5(vec_id); h%16==0 → level 2, h%4==0 → level 1, else 0.
  *     Both engines draw the SAME levels; no RNG state.
  *   - SEED CANDIDATES per layer: multi-band sign-LSH (8 bands over
  *     staggered dimension slices, coarser codes on sparser upper
  *     layers), each (band, bucket) capped at 64 members by (h,
  *     vec_id) rank — the capped-minhash skew guard, planned as
  *     WindowGroupLimit, so candidate work is Σ min(bucket, 64)²,
  *     never N².
  *   - EDGES: per-pair score = floor(cosine·1e9) BIGINT (the float-
  *     ranking quantization bridge), band-deduped; per-source top-M
  *     out-links, symmetrized (a reverse link makes hubs reachable),
  *     then re-capped per source — HNSW's bounded-degree pruning, so
  *     the index is ≤ N·Mtot edges per layer by construction.
  *   - NN-DESCENT (layer 0): a round of "my neighbor's neighbors
  *     are my candidates" (Dong et al.'s kNN-graph refinement, the
  *     standard distributed stand-in for HNSW's sequential-insert
  *     neighbor search): candidates = E ∪ (E ⨝ E), rescore, top-M,
  *     re-symmetrize. Each round is one self-join of an ≤ N·Mtot
  *     edge list — N·Mtot² pair scorings, linear in N — and repairs
  *     exactly what a one-shot LSH graph lacks on weakly-clustered
  *     embeddings (these synthetic vectors are near-random: top-10
  *     cosine ≈ 0.3, sign agreement for true NNs 0.61; measured
  *     recall@10 without descent 0.69, with one round 1.00 at
  *     N=500 and 0.950 at N=2000).
  *
  * Search (the q_graph_bfs fixed-hop pregel contract): enter at the
  * highest-level node (min vec_id tiebreak), then beam-search down
  * the layer stack — 1 hop at layer 2 (beam 2), 1 at layer 1
  * (beam 6), 3 at layer 0 (beam 64); each hop expands the frontier
  * along edges, dedups, scores against the query with the codegen'd
  * cosine, and keeps the top-beam by (qscore DESC, node ASC). Each
  * hop's scored pool is EAGERLY checkpointed (the round-13 iterative-
  * loop rule: lazy lineage compounds under AQE — the un-checkpointed
  * 9-hop first cut measured 90 s at sf0.1, dominated by re-planning,
  * not data). The final top-10 ranks the last SCORED POOL (frontier
  * ∪ its neighborhood), not just the beam.
  *
  * 100 TB story: levels downsample the corpus geometrically (N/4,
  * N/16 …) so upper layers stay broadcast-small; the build is the
  * capped-LSH join family already profiled at scale (q_dedup_minhash
  * / q_knn_graph) plus NN-descent self-joins that are ≤ N·Mtot²
  * scorings per round; search touches hops × beam × Mtot rows per
  * query — per-query cost INDEPENDENT of N, which is the entire
  * point of a navigable graph. Recall@10 vs brute force is pinned
  * ≥ 0.90 in Round15Spec2 (measured 1.00 at the spec corpus); the
  * bucket cap, degree caps and beam are the documented recall/cost
  * knobs (an operator would scale bits and beam with log N exactly
  * as IVF scales K and nprobe), mirrored verbatim in the oracle so
  * the hash gate checks the real index, not an idealization.
  */
object Round15Ops2 {

  // ---- index/search parameters (mirrored into the oracle text) ----
  private[graft] val Bands = 8
  private[graft] val Cap = 64                      // per-(band,bucket) members
  private[graft] val BitsByLayer = Map(0 -> 5, 1 -> 4, 2 -> 3)
  private[graft] val MOut = Map(0 -> 16, 1 -> 6, 2 -> 6)  // out-degree pre-sym
  private[graft] val MTot = Map(0 -> 24, 1 -> 8, 2 -> 8)  // degree after sym
  private[graft] val NndRounds = 1                 // NN-descent rounds, layer 0
  private[graft] val Hops = Seq((2, 1, 2), (1, 1, 6), (0, 3, 64)) // (layer, hops, beam)
  private[graft] val NQueries = 8
  private[graft] val TopK = 10

  /** Vectors + deterministic hash + HNSW level. */
  private[graft] def leveled(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .withColumn("h",
        conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("lvl",
        when(col("h") % 16 === 0, 2L).when(col("h") % 4 === 0, 1L)
          .otherwise(0L))

  private[graft] def qscore(a: Column, b: Column): Column =
    floor(call_function("cosine_sim", a, b) * lit(1e9)).cast("long")

  /** Per-source top-M by (qs DESC, dst ASC) over a scored pair frame. */
  private[graft] def topM(pairs: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("qs").desc, col("dst").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= m)
      .select("src", "dst", "qs")
  }

  /** Symmetrize + bounded-degree re-cap (HNSW's reverse-link pruning). */
  private[graft] def symCap(out: DataFrame, mTot: Int): DataFrame =
    topM(out.union(
        out.select(col("dst").as("src"), col("src").as("dst"), col("qs")))
      .groupBy("src", "dst").agg(max("qs").as("qs")), mTot)

  /** Bounded-degree neighbor list for one layer: capped-LSH seed pairs
    * → band-dedup → top-M out-links → symmetrize → degree re-cap →
    * (layer 0) NN-descent refinement rounds. Eagerly checkpointed —
    * the list is reused by every refinement round and search hop. */
  private[graft] def layerEdges(v: DataFrame, l: Int): DataFrame = {
    val bits = BitsByLayer(l)
    val nodes = v.filter(col("lvl") >= l)
    val banded = nodes.select(col("vec_id"), col("embedding"), col("h"),
      explode(array((0 until Bands).map(b => struct(lit(b).as("band"),
        Similarity.signBucketAt(col("embedding"), bits, b * bits)
          .as("code"))): _*)).as("bc"))
      .select(col("vec_id"), col("embedding"), col("h"),
        col("bc.band").as("band"), col("bc.code").as("code"))
    val wcap = Window.partitionBy("band", "code")
      .orderBy(col("h").asc, col("vec_id").asc)
    val capped = banded.withColumn("rk", row_number().over(wcap))
      .filter(col("rk") <= Cap)
      .select("band", "code", "vec_id", "embedding")
    val a = capped.select(col("band"), col("code"), col("vec_id").as("src"),
      col("embedding").as("ea"))
    val b = capped.select(col("band"), col("code"), col("vec_id").as("dst"),
      col("embedding").as("eb"))
    val pairs = a.join(b, Seq("band", "code"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), qscore(col("ea"), col("eb")).as("qs"))
      .groupBy("src", "dst").agg(max("qs").as("qs")) // band dedup (qs equal)
    var edges = symCap(topM(pairs, MOut(l)), MTot(l))
      .localCheckpoint(eager = true)
    if (l == 0) {
      val emb = v.select(col("vec_id"), col("embedding"))
      for (_ <- 1 to NndRounds) {
        val twoHop = edges.as("x").join(edges.as("y"),
            col("x.dst") === col("y.src") && col("y.dst") =!= col("x.src"))
          .select(col("x.src").as("src"), col("y.dst").as("dst"))
        val cand = edges.select("src", "dst").union(twoHop).distinct()
        val scored = cand
          .join(emb.select(col("vec_id"), col("embedding").as("es")),
            cand("src") === col("vec_id")).drop("vec_id")
          .join(emb.select(col("vec_id"), col("embedding").as("ed")),
            col("dst") === col("vec_id"))
          .select(col("src"), col("dst"), qscore(col("es"), col("ed")).as("qs"))
        edges = symCap(topM(scored, MOut(l)), MTot(l))
          .localCheckpoint(eager = true)
      }
    }
    edges  // (src, dst, qs) — qs kept so incremental maintenance
           // (Round16Ops) can merge edge lists without re-scoring
  }

  /** One beam-search hop: expand frontier along `edges`, dedup, score
    * vs the query, EAGERLY checkpoint the scored pool (each hop is one
    * short job over checkpointed inputs — the iterative-loop rule), and
    * derive the next frontier as the pool's top-`beam`. Returns
    * (checkpointed scored pool, new frontier). */
  private[graft] def hop(frontier: DataFrame, edges: DataFrame, v: DataFrame,
      q: DataFrame, beam: Int, ckpt: Boolean,
      bcast: Boolean = true): (DataFrame, DataFrame) = {
    val cand = frontier
      .union(frontier.join(edges, frontier("node") === edges("src"))
        .select(col("q_id"), col("dst").as("node")))
      .distinct()
    val scoredRaw = cand
      .join(v.select(col("vec_id"), col("embedding")),
        cand("node") === col("vec_id"))
      .join(if (bcast) broadcast(q) else q, "q_id")
      .select(col("q_id"), col("node"),
        qscore(col("embedding"), col("q_emb")).as("qs"))
    // upper-layer pools are a few dozen rows over shallow checkpointed
    // lineage — only the fan-out-prone layer-0 hops pay a checkpoint job
    val scored = if (ckpt) scoredRaw.localCheckpoint(eager = true) else scoredRaw
    val w = Window.partitionBy("q_id").orderBy(col("qs").desc, col("node").asc)
    val nf = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= beam).select("q_id", "node")
    (scored, nf)
  }

  // ---------------- DuckDB mirror (generated from the same params) ----
  private[graft] def bandSql(l: Int, extra: String = ""): String = {
    val bits = BitsByLayer(l)
    (0 until Bands).map { b =>
      s"""SELECT vec_id, embedding, h, $b AS band,
         |      ${Similarity.signBucketAtSql("embedding", bits, b * bits)}::BIGINT AS code
         |    FROM lv WHERE lvl >= $l$extra""".stripMargin
    }.mkString("\n    UNION ALL\n    ")
  }

  /** topM as SQL over a scored CTE. */
  private[graft] def topMSql(src: String, m: Int): String =
    s"""SELECT src, dst, qs FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src
       |      ORDER BY qs DESC, dst ASC) AS rn FROM $src)
       |  WHERE rn <= $m""".stripMargin

  /** Seed edges for layer l: out$l$sfx (pre-sym) and e${l}r0 (sym+cap). */
  private[graft] def edgeCtes(l: Int, sfx: String = "",
      extra: String = ""): String =
    s"""bnd$l$sfx AS MATERIALIZED (
       |  SELECT * FROM (
       |    ${bandSql(l, extra)}) z),
       |cap$l$sfx AS MATERIALIZED (
       |  SELECT band, code, vec_id, embedding FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band, code
       |      ORDER BY h ASC, vec_id ASC) AS rk FROM bnd$l$sfx)
       |  WHERE rk <= $Cap),
       |pr$l$sfx AS MATERIALIZED (
       |  SELECT src, dst, max(qs) AS qs FROM (
       |    SELECT a.vec_id AS src, b.vec_id AS dst,
       |      floor((${Similarity.cosineSql("a.embedding", "b.embedding")}) * 1e9)::BIGINT AS qs
       |    FROM cap$l$sfx a JOIN cap$l$sfx b
       |      ON a.band = b.band AND a.code = b.code AND a.vec_id <> b.vec_id) z
       |  GROUP BY src, dst),
       |out$l$sfx AS MATERIALIZED (
       |  ${topMSql(s"pr$l$sfx", MOut(l))}),
       |bd$l$sfx AS MATERIALIZED (
       |  SELECT src, dst, max(qs) AS qs FROM (
       |    SELECT src, dst, qs FROM out$l$sfx
       |    UNION ALL
       |    SELECT dst AS src, src AS dst, qs FROM out$l$sfx) z
       |  GROUP BY src, dst),
       |e${l}${sfx}r0 AS MATERIALIZED (
       |  ${topMSql(s"bd$l$sfx", MTot(l))})""".stripMargin

  /** One NN-descent round on layer 0: e0r${r-1} → e0r$r. */
  private[graft] def nndCtes(r: Int, sfx: String = ""): String =
    s"""ndc$r$sfx AS MATERIALIZED (
       |  SELECT src, dst FROM e0${sfx}r${r - 1}
       |  UNION
       |  SELECT a.src, b.dst FROM e0${sfx}r${r - 1} a JOIN e0${sfx}r${r - 1} b
       |    ON a.dst = b.src AND b.dst <> a.src),
       |nds$r$sfx AS MATERIALIZED (
       |  SELECT c.src, c.dst,
       |    floor((${Similarity.cosineSql("x.embedding", "y.embedding")}) * 1e9)::BIGINT AS qs
       |  FROM ndc$r$sfx c JOIN lv x ON c.src = x.vec_id
       |              JOIN lv y ON c.dst = y.vec_id),
       |ndo$r$sfx AS MATERIALIZED (
       |  ${topMSql(s"nds$r$sfx", MOut(0))}),
       |ndb$r$sfx AS MATERIALIZED (
       |  SELECT src, dst, max(qs) AS qs FROM (
       |    SELECT src, dst, qs FROM ndo$r$sfx
       |    UNION ALL
       |    SELECT dst AS src, src AS dst, qs FROM ndo$r$sfx) z
       |  GROUP BY src, dst),
       |e0${sfx}r$r AS MATERIALIZED (
       |  ${topMSql(s"ndb$r$sfx", MTot(0))})""".stripMargin

  private[graft] def hopCtes(i: Int, l: Int, beam: Int, sfx: String = "",
      qn: String = "q", layer0: String = s"e0r$NndRounds",
      upperSfx: String = ""): String = {
    // upperSfx: which upper-layer build the hop descends (e.g. "d" for
    // the post-delete rebuild in q_similarity_hnsw_delete's mirror);
    // default "" = the full-corpus layers, as every pre-r17 oracle used
    val e = if (l == 0) layer0 else s"e$l${upperSfx}r0"
    s"""c$i$sfx AS MATERIALIZED (
       |  SELECT q_id, node FROM f${i - 1}$sfx
       |  UNION
       |  SELECT f.q_id, e.dst AS node FROM f${i - 1}$sfx f JOIN $e e ON f.node = e.src),
       |s$i$sfx AS MATERIALIZED (
       |  SELECT c.q_id, c.node,
       |    floor((${Similarity.cosineSql("lv.embedding", s"$qn.q_emb")}) * 1e9)::BIGINT AS qs
       |  FROM c$i$sfx c JOIN lv ON c.node = lv.vec_id JOIN $qn ON c.q_id = $qn.q_id),
       |f$i$sfx AS MATERIALIZED (
       |  SELECT q_id, node FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn FROM s$i$sfx)
       |  WHERE rn <= $beam)""".stripMargin
  }

  /** Every CTE in the generated mirrors is written `AS MATERIALIZED`
    * AT ITS CONSTRUCTION SITE (edgeCtes/nndCtes/hopCtes/cteBody — the
    * r15 blanket string-replace postprocess is gone; an aliased
    * parenthesized expression added later can no longer be silently
    * rewritten): DuckDB 1.0 inlines CTEs by default, and the
    * doubly-referenced NN-descent and hop CTEs would otherwise expand
    * EXPONENTIALLY (the first cut exhausted the process fd limit
    * re-opening the parquet). Spark needs the same treatment — that is
    * what the eager localCheckpoints in [[layerEdges]] are. */
  private def hnswOracle: String = rawOracle

  private def recallOracle: String = rawRecallOracle

  private[graft] def lastHop: Int = Hops.map(_._2).sum

  /** Every CTE through the final scored pool s<lastHop> (no SELECT). */
  private def cteBody: String = {
    val hopList = Hops.flatMap { case (l, n, beam) => Seq.fill(n)((l, beam)) }
    val hops = hopList.zipWithIndex
      .map { case ((l, beam), i) => hopCtes(i + 1, l, beam) }
    val nnd = (1 to NndRounds).map(r => nndCtes(r))
    s"""lv AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    ('0x' || substring(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS h,
       |    CASE WHEN ('0x' || substring(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 16 = 0 THEN 2
       |         WHEN ('0x' || substring(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 4 = 0 THEN 1
       |         ELSE 0 END AS lvl
       |  FROM embeddings),
       |${edgeCtes(2)},
       |${edgeCtes(1)},
       |${edgeCtes(0)},
       |${nnd.mkString(",\n")},
       |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM lv
       |      WHERE vec_id < $NQueries),
       |ep AS MATERIALIZED (SELECT vec_id AS node FROM lv
       |       ORDER BY lvl DESC, vec_id ASC LIMIT 1),
       |f0 AS MATERIALIZED (SELECT q_id, node FROM q CROSS JOIN ep),
       |${hops.mkString(",\n")}""".stripMargin
  }

  private def rawOracle: String =
    s"""WITH $cteBody
       |SELECT q_id, rn::BIGINT AS rn, neighbor_id, qs AS qscore FROM (
       |  SELECT q_id, node AS neighbor_id, qs,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn
       |  FROM s$lastHop WHERE node <> q_id)
       |WHERE rn <= $TopK ORDER BY q_id, rn""".stripMargin

  /** Recall mirror: the SAME index+search CTEs, plus exact brute-force
    * top-K ground truth and the per-query overlap. */
  private def rawRecallOracle: String =
    s"""WITH $cteBody,
       |ann AS MATERIALIZED (
       |  SELECT q_id, node AS neighbor_id FROM (
       |    SELECT q_id, node, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qs DESC, node ASC) AS rn
       |    FROM s$lastHop WHERE node <> q_id)
       |  WHERE rn <= $TopK),
       |bf AS MATERIALIZED (
       |  SELECT q.q_id, e.vec_id AS nid,
       |    floor((${Similarity.cosineSql("e.embedding", "q.q_emb")}) * 1e9)::BIGINT AS qs
       |  FROM lv e JOIN q ON e.vec_id <> q.q_id),
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

  /** Full-corpus layer-`l` edges, STAGED under an explicit key (the
    * r16 verdict's item 5): four registered queries — q_similarity_hnsw,
    * its recall twin, and the round-17 delete pair — build the
    * IDENTICAL standing graph from the same corpus; under the bench's
    * stage-cache dir the first builder writes it once and the rest read
    * parquet. The key carries the sf dir and the corpus tag (full);
    * results are bit-identical (deterministic build, exact-integer
    * scores). At the gate (no cache dir) this is a plain build. */
  private[graft] def stagedFullEdges(s: SparkSession, d: String,
      v: DataFrame, l: Int): DataFrame =
    graft.ops.StageCache.keyed(s, s"hnsw_e$l:full:$d")(layerEdges(v, l))

  /** The full build + search, shared by the top-K query and its
    * recall readout: returns (vectors frame, top-K result). */
  private def hnswSearch(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    graft.functions.CosineSimExpr.register(s)
    val v = leveled(s, d).localCheckpoint(eager = true)
        val edgesByLayer = Map(0 -> stagedFullEdges(s, d, v, 0),
          1 -> stagedFullEdges(s, d, v, 1), 2 -> stagedFullEdges(s, d, v, 2))
        val q = v.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val entry = v.orderBy(col("lvl").desc, col("vec_id").asc).limit(1)
          .select(col("vec_id").as("node"))
        var frontier = q.select("q_id").crossJoin(broadcast(entry))
        var lastScored: DataFrame = null
        for ((l, n, beam) <- Hops; _ <- 1 to n) {
          val (scored, nf) = hop(frontier, edgesByLayer(l), v, q, beam,
            ckpt = l == 0)
          lastScored = scored
          frontier = nf
        }
    val w = Window.partitionBy("q_id")
      .orderBy(col("qs").desc, col("node").asc)
    val top = lastScored.filter(col("node") =!= col("q_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select(col("q_id"), col("rn"), col("node").as("neighbor_id"),
        col("qs").as("qscore"))
    (v, top)
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_similarity_hnsw",
      (s, d) => hnswSearch(s, d)._2.orderBy("q_id", "rn"),
      hnswOracle),

    // The recall readout as an ORACLE-CHECKED query (the
    // q_similarity_recall_sweep discipline): rebuild the index, run
    // the search, score EXACT brute-force top-10 ground truth, and
    // emit per-query hits + recall@10 — so the gate checks the ANN
    // quality claim itself, on every run, at every SF, not just the
    // spec corpus. Expected values at the gate corpora: recall 1.0 on
    // all 8 queries at N=500 (sf0.001/sf0.01); 0.95 avg at N=2000.
    //
    // Scale shape: the brute-force side is the q_similarity_topk
    // baseline shape — broadcast 8-query fan-out over one corpus scan
    // (allowlisted BNLJ class); everything else is the index build
    // already profiled at 1×/10×/30×.
    QueryDef("q_similarity_hnsw_recall",
      (s, d) => {
        val (v, top) = hnswSearch(s, d)
        val ann = top.select(col("q_id"), col("neighbor_id"))
        val q = v.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val bf = v.select(col("vec_id").as("nid"), col("embedding"))
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
      recallOracle))
}
