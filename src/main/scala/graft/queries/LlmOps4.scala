package graft.queries

import org.apache.spark.sql.DataFrame
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

  /** Lloyd's training loop shared by q_cluster_kmeans and the trained
    * IVF search: returns (final centroid frame (cid, cvec), final
    * update rows (cid, pos, c, n)). See q_cluster_kmeans for the
    * shuffle-shape and determinism analysis. */
  private def kmeansTrain(e: DataFrame): (DataFrame, DataFrame) = {
    var cents: DataFrame = e.filter(col("vec_id") < kCents)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
    var lastUpd: DataFrame = null
    for (_ <- 1 to iters) {
      val assigned = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          Similarity.l2sq(col("embedding"), col("cvec")).as("dist"))
        .groupBy("vec_id")
        .agg(min_by(struct(col("cid"), col("embedding")),
          struct(col("dist"), col("cid"))).as("best"))
        .select(col("best.cid").as("cid"), col("best.embedding").as("embedding"))
      lastUpd = assigned
        .select(col("cid"), posexplode(col("embedding")))
        .toDF("cid", "pos", "v")
        .groupBy("cid", "pos")
        .agg(sum(floor(col("v").cast("double") * lit(1e8)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          ((col("s").cast("double") / lit(1e8)) / col("n")).as("c"), col("n"))
      cents = lastUpd.groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s0 => s0.getField("c")).as("cvec"))
        .localCheckpoint(eager = false)
    }
    (cents, lastUpd)
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
    // deterministically (vec_id < 8), 3 assign/update rounds. Per round:
    //   - ASSIGN: N×K distances via a broadcast cross join against the
    //     K-row centroid frame, nearest centroid as a partial-aggregating
    //     min(struct(dist, cid)) — the shuffle carries one row per
    //     vector, never the N×K distance matrix (same shape as
    //     q_similarity_ivf's assignment and q_agg_salted's two-phase agg).
    //   - UPDATE: per-dimension mean via posexplode → partial-agg
    //     fixed-point BIGINT sums keyed (cid, pos) — K×dims rows of
    //     shuffle traffic regardless of corpus size — reassembled into
    //     centroid arrays.
    // Each round's centroid frame is lazily localCheckpoint'd (the CC
    // pattern): it feeds the next round's cross join and would otherwise
    // re-evaluate the whole prefix once per downstream reference.
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
        val (_, lastUpd) =
          kmeansTrain(Tables.embeddings(s, d).select("vec_id", "embedding"))
        lastUpd.select(col("cid"), col("pos").cast("long").as("pos"),
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
        val (cents, _) = kmeansTrain(e)
        val dists = (src: DataFrame) =>
          src.crossJoin(broadcast(cents))
            .select(col("vec_id"), col("embedding"), col("cid"),
              Similarity.l2sq(col("embedding"), col("cvec")).as("dist"))
        val assigned = dists(e)
          .groupBy("vec_id")
          .agg(min_by(struct(col("cid"), col("embedding")),
            struct(col("dist"), col("cid"))).as("best"))
          .select(col("vec_id"), col("best.embedding").as("embedding"),
            col("best.cid").as("cid"))
        val aw = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("dist").asc, col("cid").asc)
        val probes = dists(e.filter(col("vec_id") < 5))
          .withColumn("arn", row_number().over(aw))
          .filter(col("arn") <= 2)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cid"))
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
  )
}
