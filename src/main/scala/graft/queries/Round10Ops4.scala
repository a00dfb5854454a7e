package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 4: cross-source duplicate overlap — the provenance
  * diagnostic a datacard needs before mixing sources: how much of the
  * exact-duplicate mass SPANS source boundaries (scraped mirrors,
  * syndicated content) vs lives inside one source (re-crawls). A pair
  * of sources sharing many digests should be deduplicated jointly, not
  * per-source.
  */
object Round10Ops4 {

  val defs: Seq[QueryDef] = Seq(

    // For every source pair (s1 ≤ s2): the number of distinct content
    // digests present in BOTH (s1 = s2 counts digests duplicated
    // WITHIN the source, i.e. ≥ 2 docs there). The digest is the
    // 256-char PREFIX md5 — the q_dedup_prefix granularity: this
    // corpus's planted near-dups share prefixes, not full texts, and
    // prefix identity is the cross-source mirror signal real crawls
    // show (same article, different footer). Scale shape: documents
    // never shuffle — only (16-byte digest, source) pairs do; the
    // distinct collapses each source's copies first, so the per-digest
    // source list is bounded by |sources|, and the pair explode is
    // |sources|²-bounded per digest (explicitly NOT doc²). Output is
    // ≤ |sources|² rows.
    QueryDef("q_dedup_cross_sources",
      (s, d) => {
        val ds = Tables.documents(s, d)
          .select(md5(substring(col("text"), 1, 256)).as("digest"), col("source"),
            col("doc_id"))
        val perSource = ds
          .groupBy("digest", "source").agg(count(lit(1)).as("n_docs"))
        val pairs = perSource.as("x").join(perSource.as("y"),
            expr("x.digest = y.digest AND x.source <= y.source"))
          .filter(
            // same-source row = within-source duplication: require >= 2
            // docs; cross-source rows pair distinct sources
            expr("x.source < y.source OR x.n_docs >= 2"))
          .select(col("x.source").as("src1"), col("y.source").as("src2"))
        pairs.groupBy("src1", "src2")
          .agg(count(lit(1)).as("n_shared_digests"))
          .orderBy("src1", "src2")
      },
      """WITH ds AS (
        |  SELECT md5(substr(text, 1, 256)) AS digest, source, count(*) AS n_docs
        |  FROM documents GROUP BY 1, 2)
        |SELECT x.source AS src1, y.source AS src2,
        |  count(*) AS n_shared_digests
        |FROM ds x JOIN ds y ON x.digest = y.digest AND x.source <= y.source
        |WHERE x.source < y.source OR x.n_docs >= 2
        |GROUP BY 1, 2 ORDER BY src1, src2""".stripMargin),

    // ANN accuracy-vs-cost curve AS A QUERY: IVF recall@10 against the
    // exact cosine top-10 at nprobe ∈ {1, 2, 4} (the q_dedup_lsh_eval
    // discipline applied to the similarity index — the measured curve
    // IS the tuning evidence a retrieval pipeline reports before
    // trusting its index). One row per tier: candidates scored (the
    // cost axis) and hits/recall (the accuracy axis).
    //
    // Scale shape: candidates are scored ONCE at the widest tier
    // (nprobe=4, checkpointed); each narrower tier re-RANKS the same
    // frame filtered by the probe rank — nested candidate sets mean no
    // re-scoring. The 8 fixed seed centroids ride as literals (bounded
    // model state); probes broadcast; the exact side is the brute-force
    // q_similarity_topk shape over 5 broadcast queries, affordable
    // precisely because it's 5 queries — the asymmetry LSH/IVF exists
    // to exploit. Determinism: codegen'd cosine (CosineSimExpr ≡ the
    // oracle's left-fold), (cos DESC, id ASC) rank ties, integer hit
    // counts into one final division.
    QueryDef("q_similarity_recall_sweep",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        import org.apache.spark.sql.expressions.Window
        import graft.functions.Similarity
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("cv"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
          .toSeq.sortBy(_._1)
        val distArr = array_sort(array(cents.map { case (cid, cv) =>
          struct(Similarity.l2sq(col("embedding"), typedlit(cv)).as("dist"),
            lit(cid).as("cid"))
        }: _*))
        val assigned = e.select(col("vec_id"), col("embedding"),
          element_at(distArr, 1).getField("cid").as("cid"))
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            posexplode(slice(distArr, 1, 4)).as(Seq("pos", "pr")))
          .select(col("q_id"), col("q_emb"),
            (col("pos") + 1).cast("long").as("prank"),
            col("pr.cid").as("cid"))
        val cand = assigned.join(broadcast(probes),
            assigned("cid") === probes("cid") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("nb"), col("prank"),
            call_function("cosine_sim", col("embedding"), col("q_emb"))
              .as("cos"))
          .localCheckpoint(eager = false) // 3 tiers + the count reuse it
        import s.implicits._
        val tiers = Seq(1L, 2L, 4L).toDF("np")
        val tcand = cand.crossJoin(broadcast(tiers))
          .filter(col("prank") <= col("np"))
        val w = Window.partitionBy("np", "q_id")
          .orderBy(col("cos").desc, col("nb").asc)
        val ttop = tcand.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10).select("np", "q_id", "nb")
        val exact = e.as("a").crossJoin(broadcast(e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))))
          .filter(col("a.vec_id") =!= col("q_id"))
          .select(col("q_id"), col("a.vec_id").as("nb"),
            call_function("cosine_sim", col("a.embedding"), col("q_emb"))
              .as("cos"))
          .withColumn("rn", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cos").desc, col("nb").asc)))
          .filter(col("rn") <= 10).select("q_id", "nb")
        val hits = ttop.join(exact, Seq("q_id", "nb"))
          .groupBy("np").agg(count(lit(1)).as("n_hits"))
        val cnts = tcand.groupBy("np").agg(count(lit(1)).as("n_scored"))
        cnts.join(hits, Seq("np"), "left")
          .select(col("np").as("nprobe"), col("n_scored"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)).cast("double") / 50.0)
              .as("recall_at_10"))
          .orderBy("nprobe")
      },
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |c0 AS (SELECT vec_id AS cid,
        |         list_transform(embedding, x -> x::DOUBLE) AS cvec
        |       FROM embeddings WHERE vec_id < 8),
        |assignd AS (
        |  SELECT vec_id, embedding, cid,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist ASC, cid ASC) AS arn
        |  FROM (SELECT e.vec_id, e.embedding, c.cid,
        |          ${graft.functions.Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist
        |        FROM e CROSS JOIN c0 c) s0),
        |assigned AS (SELECT vec_id, embedding, cid FROM assignd WHERE arn = 1),
        |probes AS (SELECT vec_id AS q_id, embedding AS q_emb, cid,
        |             arn AS prank
        |           FROM assignd WHERE vec_id < 5 AND arn <= 4),
        |cand AS (
        |  SELECT p.q_id, a.vec_id AS nb, p.prank,
        |    ${graft.functions.Similarity.cosineSql("a.embedding", "p.q_emb")} AS cos
        |  FROM assigned a JOIN probes p
        |    ON a.cid = p.cid AND a.vec_id <> p.q_id),
        |tiers AS (SELECT unnest([1, 2, 4]) AS np),
        |tcand AS (SELECT t.np, c.q_id, c.nb, c.cos
        |          FROM cand c JOIN tiers t ON c.prank <= t.np),
        |tranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY np, q_id ORDER BY cos DESC, nb ASC) AS rn
        |  FROM tcand),
        |ttop AS (SELECT np, q_id, nb FROM tranked WHERE rn <= 10),
        |ex AS (
        |  SELECT p.q_id, a.vec_id AS nb,
        |    ${graft.functions.Similarity.cosineSql("a.embedding", "p.q_emb")} AS cos
        |  FROM e a JOIN (SELECT vec_id AS q_id, embedding AS q_emb
        |                 FROM e WHERE vec_id < 5) p
        |    ON a.vec_id <> p.q_id),
        |exact AS (SELECT q_id, nb FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY cos DESC, nb ASC) AS rn FROM ex)
        |  WHERE rn <= 10),
        |hits AS (SELECT np, count(*) AS n_hits
        |         FROM ttop JOIN exact USING (q_id, nb) GROUP BY 1),
        |cnts AS (SELECT np, count(*) AS n_scored FROM tcand GROUP BY 1)
        |SELECT c.np::BIGINT AS nprobe, c.n_scored::BIGINT AS n_scored,
        |  coalesce(h.n_hits, 0)::BIGINT AS n_hits,
        |  coalesce(h.n_hits, 0)::DOUBLE / 50.0 AS recall_at_10
        |FROM cnts c LEFT JOIN hits h ON c.np = h.np
        |ORDER BY nprobe""".stripMargin),

    // Clustering quality readout: per-cluster size, SSE, mean squared
    // distance, and inertia share over the fixed-seed K=8 assignment —
    // the evaluation row every k-means consumer inspects before
    // trusting cluster-based sampling/dedup (a cluster hoarding
    // inertia needs splitting; a near-empty one is a wasted centroid).
    // Scale shape: assignment is a narrow per-row argmin over literal
    // centroids (bounded model state), then ONE map-side-combined
    // 8-group aggregate; the total-SSE join broadcasts one row.
    // Determinism: distances quantize to 1e-8 BIGINTs BEFORE summing
    // (exact in any order), means/shares read the exact integers
    // through one shared IEEE expression.
    QueryDef("q_emb_cluster_quality",
      (s, d) => {
        import graft.functions.Similarity
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("cv"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
          .toSeq.sortBy(_._1)
        val distArr = array_sort(array(cents.map { case (cid, cv) =>
          struct(Similarity.l2sq(col("embedding"), typedlit(cv)).as("dist"),
            lit(cid).as("cid"))
        }: _*))
        val g = e
          .select(element_at(distArr, 1).getField("cid").as("cid"),
            floor(element_at(distArr, 1).getField("dist") * lit(1e8))
              .cast("long").as("dfp"))
          .groupBy("cid")
          .agg(count(lit(1)).as("n"), sum("dfp").as("sse_fp"))
        val tot = g.agg(sum("sse_fp").as("total_fp"))
        g.crossJoin(broadcast(tot))
          .select(col("cid"), col("n"), col("sse_fp"),
            (col("sse_fp").cast("double") / lit(1e8) /
              col("n").cast("double")).as("mean_sq_dist"),
            (col("sse_fp").cast("double") / col("total_fp").cast("double"))
              .as("inertia_share"))
          .orderBy("cid")
      },
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |c0 AS (SELECT vec_id AS cid,
        |         list_transform(embedding, x -> x::DOUBLE) AS cvec
        |       FROM embeddings WHERE vec_id < 8),
        |a AS (
        |  SELECT vec_id, cid, dist,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist ASC, cid ASC) AS rn
        |  FROM (SELECT e.vec_id, c.cid,
        |          ${graft.functions.Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist
        |        FROM e CROSS JOIN c0 c) s0),
        |g AS (
        |  SELECT cid, count(*) AS n,
        |    sum(floor(dist * 1e8)::BIGINT)::BIGINT AS sse_fp
        |  FROM a WHERE rn = 1 GROUP BY cid),
        |t AS (SELECT sum(sse_fp)::BIGINT AS total_fp FROM g)
        |SELECT cid, n, sse_fp,
        |  sse_fp::DOUBLE / 1e8 / n::DOUBLE AS mean_sq_dist,
        |  sse_fp::DOUBLE / total_fp::DOUBLE AS inertia_share
        |FROM g, t ORDER BY cid""".stripMargin))
}
