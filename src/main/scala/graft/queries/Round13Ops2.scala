package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.StageCache

/** Round-13 batch 2: the learned quality filter — batch logistic
  * regression over the q_text_hashfeatures 64-bucket hashed
  * bag-of-words (+ bias), trained with T unrolled full-batch gradient
  * rounds in the repo's micro fixed-point BIGINT discipline. This turns
  * the heuristic-only quality family into the fastText-shaped learned
  * classifier real curation pipelines run (Joulin et al. 2017: linear
  * model over hashed n-gram features; here unigram buckets).
  *
  * Determinism contract (the q_cluster_kmeans recipe, applied to LR):
  *   - features x_{d,j} are exact token counts; labels y from the
  *     n_chars >= 300 heuristic gate;
  *   - weights live in micro units (1e-6) as BIGINTs;
  *   - the link is the softsign squash p = 1/2 + z/(2(1+|z|)) instead
  *     of the sigmoid — same shape, same [0,1] range, but built ONLY
  *     from +,·,abs and ONE truncating integer division (no exp, no
  *     transcendental divergence):
  *       p_micro = (500000·(1e6 + |z| + z)) div (1e6 + |z|)
  *     with a provably nonnegative numerator, so Spark `div` and
  *     DuckDB `//` (both truncate toward zero) agree exactly;
  *   - the gradient step w_j -= (Σ_d (p_d − y_d)·x_{d,j}) div (4N)
  *     (η = 1/4) is BIGINT end-to-end; Spark `div` == DuckDB `//` on
  *     negatives too (both truncate — measured, not assumed).
  *
  * Magnitude bounds (documented, spec-asserted): |z_micro| stays far
  * below 1.8e13 (the 500000·(1e6+2|z|) < 2^63 overflow line) because
  * each round's step is bounded by η·1e6·max_j x̄_j; gradient sums
  * |Σ r·x| <= 1e6 · (tokens in bucket j) overflow BIGINT only past
  * ~9e12 tokens per bucket (~petabyte-token corpora) — past that,
  * accumulate in DECIMAL(38,0).
  *
  * Scale shape: per round, exactly two shuffles of the sparse
  * (doc, bucket, x) frame — z by doc_id, gradient by bucket (both
  * map-side combined) — plus a broadcast of the 65-row weight frame;
  * the feature frame is built once and staged (StageCache; the
  * signature-table pattern). T=3 unrolled rounds; the corpus is never
  * rescanned past the feature build. This is textbook distributed
  * full-batch LR: model state O(buckets), data touched O(nnz) per round.
  */
object Round13Ops2 {

  /** Unrolled training rounds. */
  private val lrRounds = 3

  /** Sparse hashed features: (doc_id, bucket 0..63, x = count) plus a
    * bias feature (bucket 64, x = 1) for every doc. */
  private def features(s: SparkSession, d: String): DataFrame = {
    val bucket = (conv(substring(md5(col("word").cast("binary")), 1, 15),
      16, 10).cast("long") % 64).as("bucket")
    val docs = Tables.documents(s, d)
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), bucket)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).cast("long").as("x"))
      .unionAll(docs.select(col("doc_id"), lit(64L).as("bucket"),
        lit(1L).as("x")))
  }

  /** One full-batch fixed-point LR round: z per doc → softsign squash →
    * residual → per-bucket gradient → weight update. `w` is the 65-row
    * (bucket, w) frame in micro units; returns the next weight frame. */
  private def lrRound(feat: DataFrame, lab: DataFrame, w: DataFrame,
      nDocs: DataFrame): DataFrame = {
    val z = feat.join(broadcast(w), "bucket")
      .groupBy("doc_id").agg(sum(col("x") * col("w")).cast("long").as("z"))
    val r = z.join(lab, "doc_id")
      .selectExpr("doc_id",
        // p_micro: nonneg numerator, truncating div == floor here
        "(500000 * (1000000 + abs(z) + z)) div (1000000 + abs(z)) - 1000000 * y AS r")
    val grad = feat.join(r, "doc_id")
      .groupBy("bucket").agg(sum(col("x") * col("r")).cast("long").as("g"))
    w.join(grad, Seq("bucket"), "left").crossJoin(broadcast(nDocs))
      .selectExpr("bucket", "(w - (coalesce(g, 0L) div (4 * n))) AS w")
  }

  val defs: Seq[QueryDef] = Seq(

    // The learned quality filter: weight trajectory (iter, bucket,
    // w_micro) over 3 unrolled full-batch rounds — the model artifact a
    // curation pipeline ships. QualityLrSpec pins the exact weights
    // against a driver-side reference implementation and the final
    // score's ROC-AUC against the heuristic baseline.
    QueryDef("q_quality_lr",
      (s, d) => {
        val feat = StageCache.stage(features(s, d))
        val lab = Tables.documents(s, d)
          .select(col("doc_id"), (col("n_chars") >= 300).cast("long").as("y"))
        val nDocs = Tables.documents(s, d)
          .agg(count(lit(1)).cast("long").as("n"))
        var w: DataFrame = s.range(0, 65).toDF("bucket")
          .select(col("bucket"), lit(0L).as("w"))
        val trail = (1 to lrRounds).map { i =>
          // eager checkpoint of the 65-row weight frame per round (r17
          // optimization round): without it the unrolled trail plan
          // re-executed every earlier round's corpus-wide z/gradient
          // joins inside each later round AND inside each union branch
          // (measured: 88 parquet scans / 170 Exchanges in one plan) —
          // the round-13 lazy-lineage finding applied to LR. Content
          // unchanged: the checkpoint materializes the identical frame.
          w = lrRound(feat, lab, w, nDocs).localCheckpoint(eager = true)
          w.select(lit(i.toLong).as("iter"), col("bucket"), col("w"))
        }
        trail.reduce(_.unionAll(_)).orderBy("iter", "bucket")
      }, {
      def round(i: Int) =
        s"""z$i AS (SELECT f.doc_id, sum(f.x * w.w)::BIGINT AS z
           |  FROM feat f JOIN w${i - 1} w USING (bucket) GROUP BY 1),
           |r$i AS (SELECT z.doc_id,
           |    ((500000 * (1000000 + abs(z.z) + z.z)) // (1000000 + abs(z.z))
           |      - 1000000 * l.y)::BIGINT AS r
           |  FROM z$i z JOIN lab l USING (doc_id)),
           |g$i AS (SELECT f.bucket, sum(f.x * r.r)::BIGINT AS g
           |  FROM feat f JOIN r$i r USING (doc_id) GROUP BY 1),
           |w$i AS (SELECT w.bucket,
           |    (w.w - (coalesce(g.g, 0) // (4 * n.n)))::BIGINT AS w
           |  FROM w${i - 1} w LEFT JOIN g$i g USING (bucket) CROSS JOIN n)"""
          .stripMargin
      s"""WITH feat AS (
         |  SELECT doc_id,
         |    ('0x' || substring(md5(word), 1, 15))::BIGINT % 64 AS bucket,
         |    count(*)::BIGINT AS x
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents)
         |  GROUP BY 1, 2
         |  UNION ALL SELECT doc_id, 64::BIGINT, 1::BIGINT FROM documents),
         |lab AS (SELECT doc_id, (n_chars >= 300)::BIGINT AS y FROM documents),
         |n AS (SELECT count(*)::BIGINT AS n FROM documents),
         |w0 AS (SELECT unnest(range(0, 65))::BIGINT AS bucket, 0::BIGINT AS w),
         |${(1 to lrRounds).map(round).mkString(",\n")}
         |${(1 to lrRounds).map(i =>
             s"SELECT $i::BIGINT AS iter, bucket, w FROM w$i")
             .mkString("\nUNION ALL\n")}
         |ORDER BY iter, bucket""".stripMargin
    }),
  )
}
