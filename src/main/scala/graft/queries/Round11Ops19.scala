package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Round-11 batch 19: leave-one-out kNN classification accuracy over
  * the embedding corpus (the label-quality / separability eval a
  * curation pipeline runs before trusting its classes) and the
  * per-node local clustering coefficient (how clique-like each node's
  * neighborhood is — the community-tightness readout above the global
  * triangle count).
  *
  * Scale shapes: kNN rides the q_knn_graph candidate machinery
  * (sign-bucket LSH → Σbucket² pairs, rank-limited top-3 windows per
  * src — WindowGroupLimit applies); the vote and accuracy stages are
  * combinable label-bounded aggregates. LocalCC reuses the
  * degree-oriented wedge join of q_graph_triangles (Σ min-deg², hub
  * bounded by the orientation) — hashes and node ids shuffle, never
  * adjacency copies beyond the oriented lists.
  */
object Round11Ops19 {

  val defs: Seq[QueryDef] = Seq(

    // Leave-one-out 3-NN majority-vote classification: candidates from
    // the 4-bit sign-bucket LSH (so isolated-bucket vectors abstain —
    // deterministic on both engines), neighbors ranked by (cosine desc,
    // dst asc), majority label with ties to the smallest label. Output:
    // per true label, classified count, hits, and accuracy.
    QueryDef("q_emb_knn_classify",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBucket(col("embedding"), 4))
        val a = e.select(col("vec_id").as("src"), col("label").cast("long").as("y"),
          col("embedding").as("emb_a"), col("bucket"))
        val b = e.select(col("vec_id").as("dst"), col("label").cast("long").as("pred"),
          col("embedding").as("emb_b"), col("bucket"))
        val wk = Window.partitionBy("src")
          .orderBy(col("cosine_sim").desc, col("dst").asc)
        val knn = a.join(b, Seq("bucket")).filter(col("src") =!= col("dst"))
          .select(col("src"), col("y"), col("dst"), col("pred"),
            call_function("cosine_sim", col("emb_a"), col("emb_b")).as("cosine_sim"))
          .withColumn("rn", row_number().over(wk))
          .filter(col("rn") <= 3)
        val wv = Window.partitionBy("src")
          .orderBy(col("votes").desc, col("pred").asc)
        val voted = knn.groupBy("src", "y", "pred")
          .agg(count(lit(1)).as("votes"))
          .withColumn("vr", row_number().over(wv))
          .filter(col("vr") === 1)
        voted.groupBy(col("y").as("label"))
          .agg(count(lit(1)).cast("long").as("n_classified"),
            count(when(col("pred") === col("y"), lit(1))).cast("long").as("n_correct"))
          .withColumn("accuracy",
            col("n_correct").cast("double") / col("n_classified").cast("double"))
          .orderBy("label")
      },
      s"""WITH e AS (SELECT vec_id, label::BIGINT AS label, embedding,
        |         ${Similarity.signBucketSql("embedding", 4)}::BIGINT AS bucket
        |       FROM embeddings),
        |p AS (SELECT a.vec_id AS src, a.label AS y, b.vec_id AS dst,
        |        b.label AS pred,
        |        ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cosine_sim
        |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY src
        |        ORDER BY cosine_sim DESC, dst ASC) AS rn FROM p),
        |knn AS (SELECT src, y, pred FROM r WHERE rn <= 3),
        |votes AS (SELECT src, y, pred, count(*)::BIGINT AS votes
        |          FROM knn GROUP BY 1, 2, 3),
        |winner AS (
        |  SELECT src, y, pred, row_number() OVER (PARTITION BY src
        |    ORDER BY votes DESC, pred ASC) AS vr
        |  FROM votes)
        |SELECT y AS label, count(*)::BIGINT AS n_classified,
        |  count(CASE WHEN pred = y THEN 1 END)::BIGINT AS n_correct,
        |  count(CASE WHEN pred = y THEN 1 END)::DOUBLE / count(*)::DOUBLE
        |    AS accuracy
        |FROM winner WHERE vr = 1
        |GROUP BY y ORDER BY label""".stripMargin),

    // Local clustering coefficient per node of the co-order part graph:
    // lcc = 2·triangles / (deg·(deg−1)) for deg ≥ 2 — the same
    // degree-oriented wedge enumeration as q_graph_triangles (every
    // triangle found exactly once, charged to all three corners), then
    // one degree join. Nodes with deg < 2 are excluded (lcc undefined).
    QueryDef("q_graph_localcc",
      (s, d) => {
        // triangle enumeration + degrees through the shared staged
        // helpers (r17): q_graph_triangles consumes the identical
        // triangle frame — one materialization per bench session
        val deg = GraphOps.coOrderDeg(s, d)
        val tri = GraphOps.orientedTriangles(s, d)
        val triPerNode = tri
          .select(explode(array(col("u"), col("v"), col("w"))).as("n"))
          .groupBy("n").agg(count(lit(1)).as("tri"))
        deg.filter(col("dg") >= 2)
          .join(triPerNode, Seq("n"), "left")
          .select(col("n").cast("long").as("node"),
            col("dg").cast("long").as("degree"),
            coalesce(col("tri"), lit(0L)).cast("long").as("triangles"))
          .withColumn("lcc",
            lit(2.0) * col("triangles").cast("double")
              / (col("degree").cast("double") * (col("degree").cast("double") - lit(1.0))))
          .orderBy("node")
      },
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |          FROM li x JOIN li y
        |          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |deg AS (SELECT n, count(*) AS dg FROM (
        |          SELECT a AS n FROM pairs UNION ALL SELECT b AS n FROM pairs)
        |        GROUP BY 1),
        |o AS (SELECT CASE WHEN (da.dg, p.a) < (db.dg, p.b) THEN p.a ELSE p.b END AS src,
        |             CASE WHEN (da.dg, p.a) < (db.dg, p.b) THEN p.b ELSE p.a END AS dst
        |      FROM pairs p JOIN deg da ON p.a = da.n JOIN deg db ON p.b = db.n),
        |tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
        |        FROM o e1 JOIN o e2 ON e1.dst = e2.src
        |        WHERE EXISTS (SELECT 1 FROM o e3
        |                      WHERE e3.src = e1.src AND e3.dst = e2.dst)),
        |tpn AS (SELECT n, count(*)::BIGINT AS tri
        |        FROM (SELECT u AS n FROM tri UNION ALL
        |              SELECT v FROM tri UNION ALL SELECT w FROM tri)
        |        GROUP BY 1)
        |SELECT deg.n::BIGINT AS node, deg.dg::BIGINT AS degree,
        |  coalesce(tpn.tri, 0)::BIGINT AS triangles,
        |  2.0 * coalesce(tpn.tri, 0)::DOUBLE
        |    / (deg.dg::DOUBLE * (deg.dg::DOUBLE - 1.0)) AS lcc
        |FROM deg LEFT JOIN tpn ON deg.n = tpn.n
        |WHERE deg.dg >= 2
        |ORDER BY node""".stripMargin),
  )
}
