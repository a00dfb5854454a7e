package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Round-4 training-data-pipeline additions: trained coarse
  * quantization (k-means over embeddings — the training step behind a
  * real IVF index, where q_similarity_ivf's fixed centroid pick is the
  * assignment/probe dataflow).
  */
object LlmOps4 {

  private val kCents = 8
  private val dims = 64
  private val iters = 3

  // PQ shape (declared before `defs`: the oracle CTE string interpolates
  // these at object init — declaring them later would bake in zeros)
  private val pqSubs = 8
  private val pqSubDim = dims / pqSubs
  private val pqK = 4
  private val pqIters = 2

  /** Per-cluster anchor budget for q_dedup_semantic's bounded comparison
    * (see its QueryDef note) and the cosine near-dup threshold. Shared
    * with OpsSpec, which re-derives the anchor set to verify the
    * keep/drop properties with the exact cosine. Declared before `defs`
    * for the same oracle-interpolation reason as the PQ shape above. */
  private[graft] val semCap = 32
  private[graft] val semThreshold = 0.4

  /** Per-row nearest-centroid id over DRIVER-HELD centroids: the K
    * distances are inlined as literal-array expressions and the argmin is
    * `least` over (dist, cid) structs — a narrow codegen'd projection, no
    * cross join, no per-vector shuffle. Ties break toward the smaller
    * cid, matching both the old min_by(struct(dist, cid)) and the
    * oracle's `ORDER BY dist ASC, cid ASC`. */
  private def nearestCid(cents: Seq[(Long, Seq[Double])]): Column = {
    val ds = cents.map { case (cid, cvec) =>
      struct(Similarity.l2sq(col("embedding"), typedlit(cvec)).as("dist"),
        lit(cid).as("cid"))
    }
    (if (ds.size == 1) ds.head else least(ds: _*)).getField("cid")
  }

  /** K threshold above which [[assign]] abandons literal inlining:
    * [[nearestCid]] emits K full distance expressions into ONE projection
    * — the right shape at demo K=8 (zero shuffle, one codegen'd pass),
    * but generated code grows linearly in K and blows past JIT/codegen
    * method limits at the K ≈ √N a SemDeDup-scale clustering needs
    * (K ≈ 3000 at N = 10M would inline a ~200k-node expression tree). */
  private[graft] val joinAssignK = 64

  /** Nearest-centroid assignment via broadcast join + partial-agg min_by
    * — the large-K scale path. Centroids ride a broadcast K-row frame
    * (model state, never corpus-scaled), the join expands N×K distance
    * rows PARTITION-LOCALLY, and the per-vector argmin collapses map-side
    * (partial min_by), so the single shuffle carries one row per
    * (mapper, vec_id) — the N×K expansion never crosses the wire.
    * Tie-break is min over (dist, cid), identical to [[nearestCid]] and
    * the oracle's `ORDER BY dist ASC, cid ASC`. */
  private def assignJoin(s: org.apache.spark.sql.SparkSession, e: DataFrame,
                         cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import s.implicits._
    val cdf = cents.toDF("cid", "cvec")
    e.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("embedding"), col("cid"),
        Similarity.l2sq(col("embedding"), col("cvec")).as("dist"))
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** Nearest-centroid assignment, path-selected by K: literal inlining
    * ([[nearestCid]]) up to [[joinAssignK]] centroids, broadcast-join +
    * partial-agg min_by ([[assignJoin]]) above it. Both paths return
    * (vec_id, embedding, cid) and are pinned value-equal on the demo
    * corpus in OpsSpec (`forceJoin` exists so the test can drive the join
    * path at demo K). */
  private[graft] def assign(s: org.apache.spark.sql.SparkSession, e: DataFrame,
                            cents: Seq[(Long, Seq[Double])],
                            forceJoin: Boolean = false): DataFrame =
    if (!forceJoin && cents.size <= joinAssignK)
      e.select(col("vec_id"), col("embedding"), nearestCid(cents).as("cid"))
    else assignJoin(s, e, cents)

  /** Trained k-means centroids for `d`'s embeddings corpus (shared with
    * the OpsSpec assignment-path equivalence pin). */
  private[graft] def trainedCentroids(s: org.apache.spark.sql.SparkSession,
                                      d: String): Seq[(Long, Seq[Double])] =
    collectCentroids(stagedKmeansUpd(s, d))

  /** The coarse-quantizer training, staged ONCE per session (r17
    * optimization round, the hnsw-family keyed-staging pattern): five
    * registered queries (q_cluster_kmeans, q_similarity_ivf_trained,
    * q_dedup_semantic, q_similarity_ivfpq, q_similarity_ivfpq_rerank)
    * re-ran the identical `iters`-round Lloyd's loop over the same
    * embeddings corpus per bench pass. The staged frame is the FINAL
    * round's K×dims update — bounded model state, bit-deterministic
    * (fixed-point BIGINT sums), so every consumer collects identical
    * centroids. Gate mode (no cache dir) degrades to the full training
    * — the oracle always exercises the real pipeline. */
  private def stagedKmeansUpd(s: org.apache.spark.sql.SparkSession,
                              d: String): DataFrame =
    graft.ops.StageCache.keyed(s, s"kmeans_upd:$d")(
      kmeansLastUpdate(Tables.embeddings(s, d).select("vec_id", "embedding")))

  /** PQ training staged the same way: the final fused round's
    * subs×K×subDim update frame, shared by q_similarity_pq and the two
    * IVFPQ consumers (each previously re-ran pqSeed + `pqIters` rounds). */
  private def stagedPqUpd(s: org.apache.spark.sql.SparkSession,
                          d: String): DataFrame =
    graft.ops.StageCache.keyed(s, s"pq_upd:$d") {
      val rows = pqSubRows(Tables.embeddings(s, d)
        .select("vec_id", "embedding")).localCheckpoint(eager = false)
      var pc = pqSeed(rows)
      for (_ <- 1 until pqIters) pc = collectPqCents(pqRound(rows, pc))
      pqRound(rows, pc)
    }

  /** One fused Lloyd's round: assign (narrow projection via
    * [[nearestCid]]) + per-dimension mean in a SINGLE aggregation — the
    * round's only shuffle carries K×dims partially-aggregated rows
    * regardless of corpus size. Fixed-point BIGINT sums keep the result
    * bit-deterministic (see q_cluster_kmeans). */
  private def roundUpdate(e: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame =
    // assignment via [[assign]] (K-dependent path; its literal branch
    // keeps the getField-on-struct argmin in its own Project: in a select
    // that also carries a generator, analysis extracts the field before
    // CreateStruct's name placeholders resolve and sees col1/col2)
    assign(e.sparkSession, e, cents)
      .select(col("cid"), posexplode(col("embedding")))
      .toDF("cid", "pos", "v")
      .groupBy("cid", "pos")
      .agg(sum(floor(col("v").cast("double") * lit(1e8)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("cid"), col("pos"),
        ((col("s").cast("double") / lit(1e8)) / col("n")).as("c"), col("n"))

  /** Pull a round's K×dims update rows back to the driver as centroid
    * vectors. The collect moves MODEL state (≤ K·dims doubles — fixed,
    * never corpus-scaled), which is the canonical distributed-Lloyd's
    * structure: centroids live on the driver between rounds and each
    * round is one scan + one tiny aggregation, instead of a lazily
    * checkpointed frame lineage re-broadcast per round. */
  private def collectCentroids(upd: DataFrame): Seq[(Long, Seq[Double])] =
    upd.select(col("cid"), col("pos"), col("c")).collect()
      .groupBy(_.getLong(0)).toSeq
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }.sortBy(_._1)

  /** Lloyd's training loop shared by q_cluster_kmeans and the trained
    * IVF search: runs `iters` fused rounds and returns the FINAL round's
    * update frame lazily (so the query's own evaluation is the last
    * round; rounds 1..iters-1 have already collected their K×dims
    * updates). See q_cluster_kmeans for determinism analysis. */
  private def kmeansLastUpdate(e: DataFrame): DataFrame = {
    var cents: Seq[(Long, Seq[Double])] = e.filter(col("vec_id") < kCents)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    for (_ <- 1 until iters)
      cents = collectCentroids(roundUpdate(e, cents))
    roundUpdate(e, cents)
  }

  /** DuckDB mirror of [[kmeansTrain]]: CTE list `e, c0, a1..u$iters,
    * c$iters` — `c$iters` holds the trained centroids. */
  private def kmeansCtes: String = {
    def round(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""a$i AS (
  SELECT vec_id, embedding, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
  FROM (SELECT e.vec_id, e.embedding, c.cid,
          ${Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist
        FROM e CROSS JOIN $prev c) s),
u$i AS (
  SELECT cid, i AS pos,
    sum(floor(embedding[i + 1]::DOUBLE * 1e8)::BIGINT) AS s,
    count(*) AS n
  FROM a$i, range(0, $dims) t(i) WHERE rn = 1 GROUP BY cid, i),
c$i AS (SELECT cid, list((s::DOUBLE / 1e8) / n ORDER BY pos) AS cvec FROM u$i GROUP BY cid)"""
    }
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
c0 AS (SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cvec
       FROM embeddings WHERE vec_id < $kCents),
${(1 to iters).map(round).mkString(",\n")}"""
  }

  val defs: Seq[QueryDef] = Seq(

    // Lloyd's k-means over the embedding corpus: K=8 centroids seeded
    // deterministically (vec_id < 8), 3 FUSED assign+update rounds. Per
    // round the assignment is a narrow per-row expression (the K
    // centroids ride along as literal arrays — [[nearestCid]]) feeding
    // directly into the per-dimension mean aggregation, so each round is
    // ONE scan and ONE shuffle of K×dims partially-aggregated rows
    // regardless of corpus size; centroids return to the driver between
    // rounds as K·dims doubles of model state (the canonical distributed
    // Lloyd's loop — no broadcast-join of a recomputed centroid lineage,
    // no per-vector argmin shuffle, no checkpoint chain).
    //
    // Determinism: float components widen to DOUBLE (exact), then
    // quantize to 8-decimal fixed point (`floor(v·1e8)` — double mul and
    // floor are identical IEEE ops in both engines, unlike
    // double→DECIMAL casts, whose rounding paths differ by one
    // scale-ulp); per-dim sums are then exact BIGINT arithmetic in any
    // order, and the mean divides back in IEEE double. The ≤1e-8
    // per-component quantization is the standard trick for making
    // distributed float reductions bit-deterministic, and it makes the
    // trained centroids hash-comparable against DuckDB's unrolled-CTE
    // mirror — the gate checks the full training result, not row counts.
    // Empty clusters drop out of the update on both sides (none occur on
    // this corpus; the seeded init keeps all 8 populated).
    QueryDef("q_cluster_kmeans",
      (s, d) => {
        stagedKmeansUpd(s, d)
          .select(col("cid"), col("pos").cast("long").as("pos"),
            col("c"), col("n"))
          .orderBy("cid", "pos")
      },
      // the training loop unrolls to one assign+update CTE pair per
      // iteration (k-means is a driver-side loop in any engine —
      // DuckDB's recursion can't carry lists)
      s"""WITH $kmeansCtes
SELECT cid, pos::BIGINT AS pos, (s::DOUBLE / 1e8) / n AS c, n
FROM u$iters ORDER BY cid, pos"""),

    // IVF search over the TRAINED quantizer — q_similarity_ivf's probe
    // dataflow pointed at the k-means centroids instead of the fixed
    // seed pick: vectors assign to their nearest trained centroid
    // (partial-agg min_by over a K-row broadcast), the 5 query vectors
    // probe their nprobe=2 nearest lists, and only those lists are
    // scored with the codegen'd cosine. Candidate work per query stays
    // N·nprobe/K; training cost amortizes over every query the index
    // serves. Recall vs brute force is pinned in OpsSpec.
    QueryDef("q_similarity_ivf_trained",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
        val cents = collectCentroids(stagedKmeansUpd(s, d))
        // assignment + probe selection are narrow projections over the
        // literal trained centroids at demo K (the broadcast-join min_by
        // path takes over above joinAssignK) — no window, no shuffle
        // until the probe-bucket scoring join itself
        val assigned = assign(s, e, cents)
        val distArr = array_sort(array(cents.map { case (cid, cvec) =>
          struct(Similarity.l2sq(col("embedding"), typedlit(cvec)).as("dist"),
            lit(cid).as("cid"))
        }: _*))
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            explode(slice(distArr, 1, 2)).as("pr"))
          .select(col("q_id"), col("q_emb"), col("pr.cid").as("cid"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
        assigned.join(broadcast(probes),
            assigned("cid") === probes("cid") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"), assigned("cid"),
            call_function("cosine_sim", col("embedding"), col("q_emb")).as("cosine_sim"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .select("q_id", "rn", "neighbor_id", "cid", "cosine_sim")
          .orderBy("q_id", "rn")
      },
      s"""WITH $kmeansCtes,
assignd AS (SELECT vec_id, embedding, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS arn
            FROM (SELECT e.vec_id, e.embedding, c.cid,
                    ${Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist
                  FROM e CROSS JOIN c$iters c) s0),
assigned AS (SELECT vec_id, embedding, cid FROM assignd WHERE arn = 1),
probes AS (SELECT vec_id AS q_id, embedding AS q_emb, cid
           FROM assignd WHERE vec_id < 5 AND arn <= 2),
sc AS (SELECT p.q_id, a.vec_id AS neighbor_id, a.cid,
         ${Similarity.cosineSql("a.embedding", "p.q_emb")} AS cosine_sim
       FROM assigned a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.q_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM sc)
SELECT q_id, rn::BIGINT AS rn, neighbor_id, cid, cosine_sim
FROM r WHERE rn <= 5 ORDER BY q_id, rn"""),

    // Product quantization (PQ) — the memory-side half of a production
    // ANN index (IVF narrows WHERE to look, PQ shrinks WHAT is stored):
    // the 64-dim vectors split into 8 subspaces of 8 dims, each subspace
    // trains its own K=4 quantizer, every vector compresses to 8 small
    // codes (4 bytes here vs 256 — at 100 TB the index fits in memory
    // because of exactly this), and queries score candidates with the
    // asymmetric-distance table: ||q_sub − centroid(code)||² summed over
    // subspaces, never touching the original vectors.
    //
    // Scale/structure notes: ALL 8 subspaces train together — each
    // Lloyd's round is still ONE corpus scan and ONE shuffle of
    // subs×K×subDim partially-aggregated rows (the assign expression
    // selects its subspace's literal centroids with a when-chain);
    // sub-vector rows are lazily checkpointed once and reused by every
    // round and the final encode; the per-query distance TABLE is
    // subs×K rows, broadcast, and the ADC join touches only (sub, cid)
    // codes. Determinism: the same fixed-point BIGINT story as
    // q_cluster_kmeans for training, and ADC cell values quantize to
    // BIGINT before the per-candidate sum, so ranking is exact integer
    // arithmetic on both engines.
    QueryDef("q_similarity_pq",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val rows = pqSubRows(Tables.embeddings(s, d).select("vec_id", "embedding"))
          .localCheckpoint(eager = false) // encode + probes reuse it
        val cents = collectPqCents(stagedPqUpd(s, d))
        val codes = rows.select(col("vec_id"), col("sub"),
          pqNearestCid(cents).as("cid"))
        val centDf = cents.toSeq.flatMap { case (sub, cs) =>
          cs.map { case (cid, cv) => (sub, cid, cv) }
        }.toDF("sub", "cid", "cvec")
        val probes = rows.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("sub"), col("sv"))
        val tbl = probes.join(broadcast(centDf), "sub")
          .select(col("qid"), col("sub"), col("cid"),
            floor(Similarity.l2sq(col("sv"), col("cvec")) * lit(1e8))
              .cast("long").as("d"))
        codes.join(broadcast(tbl), Seq("sub", "cid"))
          .filter(col("vec_id") =!= col("qid"))
          .groupBy("qid", "vec_id").agg(sum("d").as("adc_fp"))
          .withColumn("rank", row_number().over(
            Window.partitionBy("qid").orderBy(col("adc_fp").asc, col("vec_id").asc))
            .cast("long"))
          .filter(col("rank") <= 3)
          .select("qid", "rank", "vec_id", "adc_fp")
          .orderBy("qid", "rank")
      },
      s"""WITH ${pqCtes()}
SELECT qid, rank::BIGINT AS rank, vec_id, adc_fp FROM r
WHERE rank <= 3 ORDER BY qid, rank"""),

    // IVF + PQ — the production composition (what FAISS calls IVFPQ):
    // the trained coarse quantizer NARROWS (each query probes its
    // nprobe=2 nearest inverted lists), and PQ SCORES the candidates
    // from 8 compressed codes via the broadcast ADC table — the original
    // vectors are touched by neither step after training. Candidate work
    // per query is N·nprobe/K rows of (sub, cid) codes; all joins key on
    // small integers; both trainings and the ADC sums are fixed-point
    // deterministic, so the full two-quantizer pipeline hash-matches the
    // composed DuckDB mirror.
    QueryDef("q_similarity_ivfpq",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        ivfpqAdc(s, d)
          .withColumn("rank", row_number().over(
            Window.partitionBy("qid").orderBy(col("adc_fp").asc, col("vec_id").asc))
            .cast("long"))
          .filter(col("rank") <= 3)
          .select("qid", "rank", "vec_id", "adc_fp")
          .orderBy("qid", "rank")
      },
      s"""WITH $ivfpqCtes,
ir AS (SELECT qid, vec_id, adc_fp,
         row_number() OVER (PARTITION BY qid ORDER BY adc_fp ASC, vec_id ASC) AS rank
       FROM iadc)
SELECT qid, rank::BIGINT AS rank, vec_id, adc_fp FROM ir
WHERE rank <= 3 ORDER BY qid, rank"""),

    // Two-stage ANN: exact re-rank on top of IVF+PQ — the FAISS-style
    // closing step. ADC distances are quantized approximations (each
    // candidate scores against sub-centroids, not its real vector), so
    // production engines keep a top-k' of ADC survivors and re-score
    // THOSE with the exact metric before answering. k'=10 survivors per
    // query join back to `embeddings` and re-rank by the codegen'd exact
    // cosine; recall@3 vs brute force is pinned >= plain IVFPQ's in
    // OpsSpec.
    //
    // Scale shape: the expensive narrowing is unchanged (coarse lists +
    // broadcast ADC table); the exact pass touches qids×k' rows — the
    // survivor set is broadcast to the embeddings scan, so full vectors
    // move only for the sliver that gets re-scored, never shuffle wide.
    QueryDef("q_similarity_ivfpq_rerank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.CosineSimExpr.register(s)
        val surv = ivfpqAdc(s, d)
          .withColumn("arank", row_number().over(
            Window.partitionBy("qid").orderBy(col("adc_fp").asc, col("vec_id").asc)))
          .filter(col("arank") <= 10)
          .select("qid", "vec_id")
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
        val exact = e.join(broadcast(surv), "vec_id")
          .join(broadcast(e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))), "qid")
          .select(col("qid"), col("vec_id"),
            call_function("cosine_sim", col("embedding"), col("q_emb")).as("cosine_sim"))
        exact
          .withColumn("rank", row_number().over(
            Window.partitionBy("qid").orderBy(col("cosine_sim").desc, col("vec_id").asc))
            .cast("long"))
          .filter(col("rank") <= 3)
          .select("qid", "rank", "vec_id", "cosine_sim")
          .orderBy("qid", "rank")
      },
      s"""WITH $ivfpqCtes,
ir AS (SELECT qid, vec_id, adc_fp,
         row_number() OVER (PARTITION BY qid ORDER BY adc_fp ASC, vec_id ASC) AS arank
       FROM iadc),
surv AS (SELECT qid, vec_id FROM ir WHERE arank <= 10),
ex AS (SELECT s1.qid, s1.vec_id,
         ${Similarity.cosineSql("n.embedding", "q.embedding")} AS cosine_sim
       FROM surv s1
         JOIN e n ON n.vec_id = s1.vec_id
         JOIN e q ON q.vec_id = s1.qid),
rr AS (SELECT qid, vec_id, cosine_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, vec_id ASC) AS rank
       FROM ex)
SELECT qid, rank::BIGINT AS rank, vec_id, cosine_sim FROM rr
WHERE rank <= 3 ORDER BY qid, rank"""),

    // SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    // efficient learning at web-scale through semantic deduplication"):
    // embeddings cluster via the SAME Lloyd's training as the IVF index,
    // and near-duplicate search runs ONLY within each cluster. Keep rule:
    // the smallest vec_id in each near-dup neighborhood survives
    // (deterministic "keep first" — the paper keeps the point farthest
    // from the centroid; min-id is the hash-stable variant of the same
    // one-per-neighborhood choice).
    //
    // BOUNDED comparison (the capped-LSH pattern, q_dedup_minhash_capped):
    // only each cluster's [[semCap]] smallest-id members act as ANCHORS on
    // the comparison's left side; every member still compares against all
    // anchors of its cluster, so the join costs Σ_c |c|·B — LINEAR in N at
    // fixed K — instead of the uncapped Σ_c |c|² ≈ N²/K, which stays
    // quadratic no matter how the constants are tuned. In production K
    // additionally scales with the corpus (the paper's K ≈ √N), but
    // nothing used to ENFORCE that here; the anchor cap bounds the join
    // structurally, the same way the minhash bucket cap bounds a
    // degenerate shingle bucket. The identical cap runs in the DuckDB
    // mirror, so the recall trade cancels and the compare stays
    // hash-exact. The rank filter plans as WindowGroupLimit (pinned in
    // PlanSpec): per cluster only the top-B rows survive the rank sort.
    //
    // Scale shape: assignment is the narrow centroid argmin ([[assign]] —
    // literal inlining at demo K, broadcast-join min_by above
    // [[joinAssignK]]), the anchor window + self-join shuffle on cluster
    // id, the dropped set is id-small and anti-joins back. Cosine
    // compares are the bit-deterministic codegen'd kernel on both
    // engines.
    QueryDef("q_dedup_semantic",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.CosineSimExpr.register(s)
        val assigned = semanticAssigned(s, d)
        val anchors = assigned
          .withColumn("rn", row_number().over(
            Window.partitionBy("cid").orderBy("vec_id")))
          .filter(col("rn") <= semCap)
          .select(col("cid"), col("vec_id").as("v1"),
            col("embedding").as("e1"))
        val b = assigned.select(col("cid"), col("vec_id").as("v2"),
          col("embedding").as("e2"))
        val dropped = anchors.join(b, Seq("cid"))
          .filter(col("v1") < col("v2"))
          .filter(call_function("cosine_sim", col("e1"), col("e2")) >= lit(semThreshold))
          .select(col("v2").as("vec_id")).distinct()
        assigned.join(dropped, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("cid"))
          .orderBy("vec_id")
      },
      s"""WITH $kmeansCtes,
assignd AS (SELECT vec_id, embedding, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS arn
            FROM (SELECT e.vec_id, e.embedding, c.cid,
                    ${Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist
                  FROM e CROSS JOIN c$iters c) s0),
assigned AS (SELECT vec_id, embedding, cid FROM assignd WHERE arn = 1),
anch AS (SELECT cid, vec_id, embedding,
           row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS rn
         FROM assigned),
dropped AS (SELECT DISTINCT b.vec_id
            FROM anch a JOIN assigned b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE a.rn <= $semCap
              AND ${Similarity.cosineSql("a.embedding", "b.embedding")} >= $semThreshold)
SELECT vec_id, cid FROM assigned
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY vec_id"""),

    // Centroid-distance outlier filter — the embedding-space quality cut
    // (the CLIP-score/DataComp family): vectors far from their own
    // cluster's centroid are mislabeled, noisy, or off-distribution, and
    // curation drops the farthest decile per cluster. Same trained
    // centroids as the IVF/SemDeDup family; "farthest" is lowest cosine
    // to the assigned centroid, ties to the smaller vec_id.
    //
    // The cut is RANK-based, not a float-threshold: per cluster, rank by
    // (cosine ASC, vec_id ASC) and flag rank ≤ ⌊|c|/10⌋ — integer
    // arithmetic both engines mirror exactly, no percentile
    // interpolation in the compare path. Scale shape: assignment is the
    // K-path-selected narrow projection ([[assign]]), scoring joins the
    // K-row broadcast centroid table, and the rank/count windows shuffle
    // once on cid — cluster-scoped like q_dedup_semantic's anchor
    // window. The exact in-cluster rank sorts N/K rows per partition; at
    // extreme cluster sizes the loose-scale path is an approx-quantile
    // threshold per cluster (bounded sketch state) with the SAME keep
    // rule, traded like q_agg_percentile_approx vs q_agg_percentile.
    QueryDef("q_filter_outliers",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
        val cents = trainedCentroids(s, d)
        val cdf = cents.toDF("cid", "cvec")
        // Similarity.cosine (the double-fold HOF), not the float-array
        // native kernel: centroids are double vectors and the fold's
        // element-wise double casts are what cosineSql mirrors
        val scored = assign(s, e, cents)
          .join(broadcast(cdf), "cid")
          .select(col("vec_id"), col("cid"),
            Similarity.cosine(col("embedding"), col("cvec")).as("cos_center"))
        val byCid = Window.partitionBy("cid")
        scored
          .withColumn("rn", row_number().over(
            byCid.orderBy(col("cos_center").asc, col("vec_id").asc)))
          .withColumn("n_c", count(lit(1)).over(byCid))
          .select(col("vec_id"), col("cid"), col("cos_center"),
            (col("rn") <= floor(col("n_c") / 10)).as("is_outlier"))
          .orderBy("vec_id")
      },
      s"""WITH $kmeansCtes,
assignd AS (SELECT vec_id, embedding, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS arn
            FROM (SELECT e.vec_id, e.embedding, c.cid,
                    ${Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist
                  FROM e CROSS JOIN c$iters c) s0),
assigned AS (SELECT vec_id, embedding, cid FROM assignd WHERE arn = 1),
scored AS (SELECT a.vec_id, a.cid,
             ${Similarity.cosineSql("a.embedding", "c.cvec")} AS cos_center
           FROM assigned a JOIN c$iters c ON c.cid = a.cid),
r AS (SELECT vec_id, cid, cos_center,
        row_number() OVER (PARTITION BY cid ORDER BY cos_center ASC, vec_id ASC) AS rn,
        count(*) OVER (PARTITION BY cid) AS n_c
      FROM scored)
SELECT vec_id, cid, cos_center, (rn <= n_c // 10) AS is_outlier
FROM r ORDER BY vec_id"""),
  )

  /** Trained-cluster assignment shared by q_dedup_semantic and the
    * OpsSpec property test (the test needs EVERY vector's cluster — the
    * query output carries only the kept ones). */
  private[graft] def semanticAssigned(s: org.apache.spark.sql.SparkSession,
                                      d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    assign(s, e, collectCentroids(stagedKmeansUpd(s, d)))
  }

  /** Shared IVF+PQ candidate scoring (q_similarity_ivfpq and its exact
    * re-rank twin): trained coarse lists narrow, PQ codes + a broadcast
    * per-query ADC table score — returns (qid, vec_id, adc_fp), one row
    * per surviving (query, candidate). See q_similarity_ivfpq's note for
    * the scale analysis. */
  private def ivfpqAdc(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    // the full candidate scoring is itself staged (r17 optimization
    // round): q_similarity_ivfpq and its exact-re-rank twin consume the
    // IDENTICAL (qid, vec_id, adc_fp) frame — deterministic (exact
    // BIGINT ADC sums), so staging is bit-transparent
    graft.ops.StageCache.keyed(s, s"ivfpq_adc:$d")(ivfpqAdcBuild(s, d))

  private def ivfpqAdcBuild(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    // coarse quantizer: which list does each vector live in
    val coarse = collectCentroids(stagedKmeansUpd(s, d))
    val assigned = assign(s, e, coarse)
      .select(col("vec_id"), col("cid").as("list_id"))
    val distArr = array_sort(array(coarse.map { case (cid, cvec) =>
      struct(Similarity.l2sq(col("embedding"), typedlit(cvec)).as("dist"),
        lit(cid).as("cid"))
    }: _*))
    val probeLists = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), explode(slice(distArr, 1, 2)).as("pr"))
      .select(col("qid"), col("pr.cid").as("list_id"))
    val candidates = assigned.join(broadcast(probeLists), "list_id")
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id")
    // PQ: codes + per-query ADC table (training staged — stagedPqUpd)
    val rows = pqSubRows(e).localCheckpoint(eager = false)
    val pcents = collectPqCents(stagedPqUpd(s, d))
    val codes = rows.select(col("vec_id"), col("sub"),
      pqNearestCid(pcents).as("cid"))
    val centDf = pcents.toSeq.flatMap { case (sub, cs) =>
      cs.map { case (cid, cv) => (sub, cid, cv) }
    }.toDF("sub", "cid", "cvec")
    val probes = rows.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("sub"), col("sv"))
    val tbl = probes.join(broadcast(centDf), "sub")
      .select(col("qid"), col("sub"), col("cid"),
        floor(Similarity.l2sq(col("sv"), col("cvec")) * lit(1e8))
          .cast("long").as("d"))
    candidates.join(codes, "vec_id")
      .join(broadcast(tbl), Seq("qid", "sub", "cid"))
      .groupBy("qid", "vec_id").agg(sum("d").as("adc_fp"))
  }

  /** DuckDB mirror of [[ivfpqAdc]] — CTE chain ending at `iadc`
    * (qid, vec_id, adc_fp). */
  private def ivfpqCtes: String = s"""$kmeansCtes,
${pqCtes("pq")},
assignd AS (SELECT vec_id, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS arn
            FROM (SELECT e.vec_id, c.cid,
                    ${Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist
                  FROM e CROSS JOIN c$iters c) s0),
assigned AS (SELECT vec_id, cid AS list_id FROM assignd WHERE arn = 1),
probel AS (SELECT vec_id AS qid, cid AS list_id
           FROM assignd WHERE vec_id < 5 AND arn <= 2),
cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probel p USING (list_id)
         WHERE a.vec_id <> p.qid),
iadc AS (SELECT c.qid, c.vec_id, sum(t.d)::BIGINT AS adc_fp
         FROM cand c
           JOIN pqcodes k ON k.vec_id = c.vec_id
           JOIN pqtbl t ON t.qid = c.qid AND t.sub = k.sub AND t.cid = k.cid
         GROUP BY 1, 2)"""

  // ---- PQ internals ------------------------------------------------------

  /** One row per (vector, subspace): `sv` is that subspace's dim slice. */
  private def pqSubRows(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
        explode(sequence(lit(0), lit(pqSubs - 1))).as("sub"), col("embedding"))
      .select(col("vec_id"), col("sub"),
        slice(col("embedding"), col("sub") * pqSubDim + 1, lit(pqSubDim)).as("sv"))

  /** Seed each subspace's quantizer from the first K vectors' slices. */
  private def pqSeed(rows: DataFrame): Map[Int, Seq[(Long, Seq[Double])]] =
    rows.filter(col("vec_id") < pqK)
      .select(col("sub"), col("vec_id").as("cid"),
        transform(col("sv"), x => x.cast("double")).as("cvec"))
      .collect()
      .groupBy(_.getInt(0)).map { case (s, rs) =>
        s -> rs.map(r => (r.getLong(1), r.getSeq[Double](2))).sortBy(_._1).toSeq
      }

  /** Nearest-centroid cid within the row's OWN subspace: a when-chain
    * selects the subspace, then the same literal-array argmin as
    * [[nearestCid]]. Ties break toward the smaller cid. */
  private def pqNearestCid(cents: Map[Int, Seq[(Long, Seq[Double])]]): Column =
    (0 until pqSubs).foldLeft(lit(-1L)) { (els, s) =>
      val ds = cents(s).map { case (cid, cv) =>
        struct(Similarity.l2sq(col("sv"), typedlit(cv)).as("dist"),
          lit(cid).as("cid"))
      }
      when(col("sub") === s,
        (if (ds.size == 1) ds.head else least(ds: _*)).getField("cid"))
        .otherwise(els)
    }

  /** One fused Lloyd's round across ALL subspaces: one scan, one shuffle
    * of subs×K×subDim fixed-point partials. */
  private def pqRound(rows: DataFrame,
                      cents: Map[Int, Seq[(Long, Seq[Double])]]): DataFrame =
    rows.select(col("sub"), pqNearestCid(cents).as("cid"), col("sv"))
      .select(col("sub"), col("cid"), posexplode(col("sv")))
      .toDF("sub", "cid", "pos", "v")
      .groupBy("sub", "cid", "pos")
      .agg(sum(floor(col("v").cast("double") * lit(1e8)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("sub"), col("cid"), col("pos"),
        ((col("s").cast("double") / lit(1e8)) / col("n")).as("c"))

  private def collectPqCents(upd: DataFrame): Map[Int, Seq[(Long, Seq[Double])]] =
    upd.collect()
      .groupBy(_.getInt(0)).map { case (s, rs) =>
        s -> rs.groupBy(_.getLong(1)).toSeq.map { case (cid, ps) =>
          (cid, ps.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
        }.sortBy(_._1)
      }

  /** DuckDB mirror: subspace rows → seeded c0 → (assign, update) per
    * iteration with `sub` as a column (the same all-subspaces-at-once
    * structure as the Spark side) → codes, probe distance table, ADC.
    * `p` prefixes every CTE name so this chain can coexist with
    * [[kmeansCtes]] in the IVF+PQ composition. */
  private def pqCtes(p: String = ""): String = {
    def round(i: Int): String =
      s"""${p}a$i AS (
  SELECT vec_id, sub, sv, cid,
    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, cid ASC) AS rn
  FROM (SELECT v.vec_id, v.sub, v.sv, c.cid,
          ${Similarity.l2sqSql("v.sv", "c.cvec")} AS dist
        FROM ${p}sv v JOIN ${p}c${i - 1} c USING (sub)) s),
${p}u$i AS (
  SELECT sub, cid, i AS pos,
    sum(floor(sv[i + 1]::DOUBLE * 1e8)::BIGINT) AS s, count(*) AS n
  FROM ${p}a$i, range(0, $pqSubDim) t(i) WHERE rn = 1 GROUP BY sub, cid, i),
${p}c$i AS (SELECT sub, cid, list((s::DOUBLE / 1e8) / n ORDER BY pos) AS cvec
        FROM ${p}u$i GROUP BY sub, cid)"""
    val enc = pqIters + 1
    s"""${p}sv AS (SELECT vec_id, s.sub::INTEGER AS sub,
         list_slice(embedding, s.sub * $pqSubDim + 1, s.sub * $pqSubDim + $pqSubDim) AS sv
       FROM embeddings, range(0, $pqSubs) s(sub)),
${p}c0 AS (SELECT sub, vec_id AS cid, list_transform(sv, x -> x::DOUBLE) AS cvec
       FROM ${p}sv WHERE vec_id < $pqK),
${(1 to pqIters).map(round).mkString(",\n")},
${round(enc)},
${p}codes AS (SELECT vec_id, sub, cid FROM ${p}a$enc WHERE rn = 1),
${p}probes AS (SELECT vec_id AS qid, sub, sv FROM ${p}sv WHERE vec_id < 5),
${p}tbl AS (SELECT p.qid, c.sub, c.cid,
          floor((${Similarity.l2sqSql("p.sv", "c.cvec")}) * 1e8)::BIGINT AS d
        FROM ${p}probes p JOIN ${p}c$pqIters c USING (sub)),
${p}adc AS (SELECT t.qid, k.vec_id, sum(t.d)::BIGINT AS adc_fp
        FROM ${p}codes k JOIN ${p}tbl t ON t.sub = k.sub AND t.cid = k.cid
        WHERE k.vec_id <> t.qid GROUP BY 1, 2),
${p}r AS (SELECT qid, vec_id, adc_fp,
        row_number() OVER (PARTITION BY qid ORDER BY adc_fp ASC, vec_id ASC) AS rank
      FROM ${p}adc)"""
  }
}
