package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Similarity
import graft.ops.{Dedup, Multimodal, TextAnalysis}

/** Training-data pipeline operators (builder-prompt first-class set):
  * deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  * similarity search (brute-force + LSH-bucketed ANN), text analysis
  * (lang-ID, quality, tokens, fingerprints), multimodal columns.
  *
  * Oracle strategy: wherever the algorithm is SQL-expressible the DuckDB
  * oracle mirrors the EXACT algorithm (e.g. the same md5-minhash bands),
  * so LSH recall characteristics cancel out and results match exactly.
  * xxhash64-based SimHash has no DuckDB twin → rows-only check.
  */
object LlmOps {

  private val nHashes = 16
  private val nBands = 4
  private val minhashThreshold = 0.9

  /** The permutation hash both engines share: md5's first 15 hex chars
    * (60 bits) read as a BIGINT — Spark computes
    * `conv(substring(md5(...), 1, 15), 16, 10)::LONG` ([[graft.ops.Dedup]]),
    * and fixed-length lowercase hex sorts identically to its numeric
    * value, so the BIGINT min is the hex-prefix min on both sides. */
  private def sigCol(i: Int): String =
    s"min(('0x' || substring(md5('$i|' || word), 1, 15))::BIGINT) AS s$i"

  /** Shared CTE chain computing the minhash-LSH verified pairs (`v`). */
  private def minhashPairCtes: String = {
    val rows = nHashes / nBands
    val sigCols = (0 until nHashes).map(sigCol).mkString(", ")
    val bandSelects = (0 until nBands).map { j =>
      val cat = (0 until rows).map(r => s"s${j * rows + r}::VARCHAR").mkString(" || '|' || ")
      s"SELECT doc_id, $j AS band_idx, md5($cat) AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    s"""w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents),
sig AS (SELECT doc_id, $sigCols FROM w GROUP BY doc_id),
band AS ($bandSelects),
cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM band x
         JOIN band y ON x.band_idx = y.band_idx AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
ws AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s FROM documents),
v AS (SELECT d1, d2,
        len(list_intersect(x.s, y.s))::DOUBLE
          / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
      FROM cand JOIN ws x ON d1 = x.doc_id JOIN ws y ON d2 = y.doc_id)"""
  }

  private def minhashOracle: String =
    s"""WITH $minhashPairCtes
SELECT d1, d2, jaccard FROM v WHERE jaccard >= $minhashThreshold ORDER BY d1, d2"""

  /** Oracle for the bucket-CAPPED minhash: mirrors the Spark pipeline at
    * distinct-word-set granularity — group docs by canonical set, run
    * sig/band per set, admit only the `cap` sets with smallest
    * representative doc id per (band, bucket) (the deterministic cap rule
    * `Dedup.minHashPairs(bucketCap)` applies), verify, then expand back
    * to doc pairs (+ identical-set pairs at jaccard 1.0). Because both
    * engines apply the identical cap, its recall effects cancel and the
    * hash compare stays exact. */
  private def minhashCappedOracle(cap: Int): String = {
    val rows = nHashes / nBands
    val sigCols = (0 until nHashes).map(sigCol).mkString(", ")
    val bandSelects = (0 until nBands).map { j =>
      val cat = (0 until rows).map(r => s"s${j * rows + r}::VARCHAR").mkString(" || '|' || ")
      s"SELECT rep, $j AS band_idx, md5($cat) AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH sh AS (SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS canon
       FROM documents),
reps AS (SELECT canon, min(doc_id) AS rep FROM sh GROUP BY canon),
sets AS (SELECT rep, string_split(canon, ' ') AS s FROM reps),
w AS (SELECT rep, unnest(s) AS word FROM sets),
sig AS (SELECT rep, $sigCols FROM w GROUP BY rep),
band AS ($bandSelects),
capped AS (SELECT rep, band_idx, bucket FROM band
           QUALIFY row_number() OVER (PARTITION BY band_idx, bucket ORDER BY rep) <= $cap),
cand AS (SELECT DISTINCT x.rep AS r1, y.rep AS r2 FROM capped x
         JOIN capped y ON x.band_idx = y.band_idx AND x.bucket = y.bucket AND x.rep < y.rep),
v AS (SELECT r1, r2,
        len(list_intersect(a.s, b.s))::DOUBLE
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      FROM cand JOIN sets a ON r1 = a.rep JOIN sets b ON r2 = b.rep),
mem AS (SELECT sh.doc_id, r.rep FROM sh JOIN reps r USING (canon)),
cross_p AS (SELECT least(m1.doc_id, m2.doc_id) AS d1,
              greatest(m1.doc_id, m2.doc_id) AS d2, jaccard
            FROM v JOIN mem m1 ON r1 = m1.rep JOIN mem m2 ON r2 = m2.rep
            WHERE jaccard >= $minhashThreshold),
within AS (SELECT m1.doc_id AS d1, m2.doc_id AS d2, 1.0::DOUBLE AS jaccard
           FROM sh m1 JOIN sh m2 ON m1.canon = m2.canon AND m1.doc_id < m2.doc_id)
SELECT d1, d2, jaccard FROM (SELECT * FROM cross_p UNION ALL SELECT * FROM within)
ORDER BY d1, d2"""
  }

  /** Cluster oracle: same pair CTEs + recursive-CTE reachability; the
    * min-label-per-component fixpoint is algorithm-independent, so this
    * matches Spark's iterative label propagation exactly. */
  private def clusterOracle: String =
    s"""WITH RECURSIVE $minhashPairCtes,
p AS (SELECT d1, d2 FROM v WHERE jaccard >= $minhashThreshold),
edges AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p),
reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node),
lab AS (SELECT node AS doc_id, min(label) AS cluster_rep FROM reach GROUP BY node)
SELECT doc_id, cluster_rep,
  (count(*) OVER (PARTITION BY cluster_rep))::BIGINT AS cluster_size
FROM lab ORDER BY doc_id"""

  /** DuckDB mirror of [[graft.ops.Dedup.simHashPairsMd5]]: md5-hex → 60-bit
    * word hash, per-bit majority votes, 4×15-bit banded candidates,
    * hamming ≤ 10 — stage-for-stage identical to the Spark pipeline. */
  private def simhashMd5Oracle: String = {
    val oCols = (0 until 60).map(i => s"sum((h >> $i) & 1) AS o$i").mkString(", ")
    val fpExpr = (0 until 60)
      .map(i => s"(CASE WHEN 2 * o$i > n THEN (1::BIGINT << $i) ELSE 0 END)")
      .mkString(" | ")
    val bandSelects = (0 until 4).map(j =>
      s"SELECT doc_id, simhash, $j AS band_idx, (simhash >> ${j * 15}) & 32767 AS band_val FROM fp")
      .mkString(" UNION ALL ")
    s"""WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents),
h AS (SELECT doc_id, ('0x' || substring(md5(word), 1, 15))::BIGINT AS h FROM w),
v AS (SELECT doc_id, count(*) AS n, $oCols FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, $fpExpr AS simhash FROM v),
band AS ($bandSelects),
cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2, x.simhash AS h1, y.simhash AS h2
         FROM band x JOIN band y ON x.band_idx = y.band_idx AND x.band_val = y.band_val
           AND x.doc_id < y.doc_id)
SELECT d1, d2, bit_count(xor(h1, h2))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(h1, h2)) <= 10 ORDER BY d1, d2"""
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_dedup_exact",
      (s, d) => Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id"),
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS content_md5
         FROM documents GROUP BY md5(text) ORDER BY keep_id"""),

    QueryDef("q_dedup_minhash",
      (s, d) => Dedup.minHashPairs(Tables.documentsBalanced(s, d), "doc_id", "text",
        nHashes, nBands, minhashThreshold).orderBy("d1", "d2"),
      minhashOracle),

    // Bucket-size-CAPPED minhash — the skew-guarded scale twin of
    // q_dedup_minhash (same exact/bucketed pairing as q_dedup_embcos /
    // q_dedup_embcos_bucketed): per (band, bucket) only the 8 sets with
    // smallest representative doc id enter candidate generation, so a
    // degenerate shingle distribution can never push the self-join toward
    // bucket² on a hot key. The oracle applies the identical cap, so the
    // recall trade cancels and the compare stays hash-exact.
    QueryDef("q_dedup_minhash_capped",
      (s, d) => Dedup.minHashPairs(Tables.documentsBalanced(s, d), "doc_id", "text",
        nHashes, nBands, minhashThreshold, bucketCap = 8).orderBy("d1", "d2"),
      minhashCappedOracle(8)),

    // The minhash sketch as an estimator: matching-signature fraction vs
    // exact Jaccard on consecutive doc pairs — the accuracy story behind
    // the LSH dedup path, oracle-checked (E[est] = J, err ~ 1/sqrt(k)).
    QueryDef("q_minhash_estimate",
      (s, d) => {
        val sigs = Dedup.minHashSignatures(Tables.documentsBalanced(s, d), "doc_id", "text", 16)
        val matches = (0 until 16)
          .map(i => when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0))
          .reduce(_ + _)
        val sets = Tables.documents(s, d)
          .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
        val inter = size(array_intersect(col("sx.ws"), col("sy.ws")))
        sigs.as("x").join(sigs.as("y"), col("y.doc_id") === col("x.doc_id") + 1)
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            (matches.cast("double") / 16).as("est_jaccard"))
          .join(sets.as("sx"), col("d1") === col("sx.doc_id"))
          .join(sets.as("sy"), col("d2") === col("sy.doc_id"))
          .select(col("d1"), col("d2"), col("est_jaccard"),
            (inter.cast("double") /
              (size(col("sx.ws")) + size(col("sy.ws")) - inter)).as("exact_jaccard"))
          .orderBy("d1")
      },
      s"""WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents),
         sig AS (SELECT doc_id, ${(0 until 16).map(sigCol).mkString(", ")} FROM w GROUP BY doc_id),
         ws AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s FROM documents)
         SELECT x.doc_id AS d1, y.doc_id AS d2,
           (${(0 until 16).map(i => s"CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END").mkString(" + ")})::DOUBLE / 16 AS est_jaccard,
           len(list_intersect(sx.s, sy.s))::DOUBLE
             / (len(sx.s) + len(sy.s) - len(list_intersect(sx.s, sy.s))) AS exact_jaccard
         FROM sig x JOIN sig y ON y.doc_id = x.doc_id + 1
           JOIN ws sx ON x.doc_id = sx.doc_id JOIN ws sy ON y.doc_id = sy.doc_id
         ORDER BY d1"""),

    // MinHash-LSH over BIGRAM shingles — the n-gram granularity of the
    // same pipeline (word-order-sensitive, unlike the unigram word-set
    // variant): documents are pre-shingled into "w1_w2" tokens and fed
    // through the unchanged minHashPairs operator; the oracle mirrors the
    // identical shingling + pipeline. Lower threshold (0.8): bigram
    // Jaccard runs below unigram Jaccard for near-dups.
    QueryDef("q_dedup_minhash_ngram",
      (s, d) => {
        val ws = split(col("text"), " ")
        // zip_with/slice construction (short-doc-safe, ~7× cheaper than
        // an index walk — the shingling IS this query's cost floor);
        // single-word docs get an empty set (DuckDB's range(1, 1) is
        // empty already, so oracles agree)
        val bigrams = TextAnalysis.bigrams(ws, "_")
        // inline() Generate barrier: minHashPairs references the shingle
        // column several times (digest + word set), and CollapseProject
        // would inline this whole construction into every use — the
        // round-1 from_csv 10×-recompute trap. The barrier pins the
        // bigram ARRAY to one evaluation per row, and `tokenized = true`
        // hands it to minHashPairs as-is — no flattening to a giant
        // shingle string that the operator would immediately re-split.
        val shingled = Tables.documents(s, d)
          .select(col("doc_id"),
            inline(array(struct(bigrams.as("shingles")))))
        Dedup.minHashPairs(shingled, "doc_id", "shingles",
          nHashes, nBands, 0.8, tokenized = true).orderBy("d1", "d2")
      },
      s"""WITH sh AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || '_' || string_split(text, ' ')[i+1])) AS s
           FROM documents),
         w AS (SELECT doc_id, unnest(s) AS word FROM sh),
         sig AS (SELECT doc_id, ${(0 until nHashes).map(sigCol).mkString(", ")}
           FROM w GROUP BY doc_id),
         band AS (${(0 until nBands).map { j =>
           val cat = (0 until nHashes / nBands).map(r =>
             s"s${j * (nHashes / nBands) + r}::VARCHAR").mkString(" || '|' || ")
           s"SELECT doc_id, $j AS band_idx, md5($cat) AS bucket FROM sig"
         }.mkString(" UNION ALL ")}),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM band x
                  JOIN band y ON x.band_idx = y.band_idx AND x.bucket = y.bucket
                    AND x.doc_id < y.doc_id),
         v AS (SELECT d1, d2,
                 len(list_intersect(x.s, y.s))::DOUBLE
                   / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
               FROM cand JOIN sh x ON d1 = x.doc_id JOIN sh y ON d2 = y.doc_id)
         SELECT d1, d2, jaccard FROM v WHERE jaccard >= 0.8 ORDER BY d1, d2"""),

    // Keep-best dedup policy: per exact-content group, retain the highest
    // quality-score document (id-ascending tiebreak) — the production
    // alternative to keep-min-id.
    QueryDef("q_dedup_keepbest",
      (s, d) => {
        val scored = Tables.documents(s, d).select(col("doc_id"),
          md5(col("text").cast("binary")).as("content_md5"),
          TextAnalysis.qualityScore(col("text")).as("quality_score"))
        val w = Window.partitionBy("content_md5")
          .orderBy(col("quality_score").desc, col("doc_id").asc)
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("content_md5", "doc_id", "quality_score")
          .orderBy("doc_id")
      },
      """WITH scored AS (
           SELECT doc_id, md5(text) AS content_md5,
             least(1.0, len(string_split(text, ' '))::DOUBLE / 100.0)
               * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                  / len(string_split(text, ' '))) AS quality_score
           FROM documents),
         r AS (SELECT *, row_number() OVER (PARTITION BY content_md5
                 ORDER BY quality_score DESC, doc_id ASC) AS rn FROM scored)
         SELECT content_md5, doc_id, quality_score FROM r WHERE rn = 1
         ORDER BY doc_id"""),

    // Transitive dedup clustering over the minhash pair graph: every doc
    // labeled with its component's min doc_id — the keep/drop decision
    // surface of a production dedup pipeline. Runs CC at DIGEST
    // granularity (Dedup.dedupClusters): identical word sets are cliques
    // in the doc-level graph, so the digest graph carries 21× fewer
    // edges for the same components; the oracle still states the
    // fixpoint over the doc-level pair graph (algorithm-independent).
    QueryDef("q_dedup_cluster",
      (s, d) => {
        val labels = Dedup.dedupClusters(Tables.documents(s, d),
          "doc_id", "text", nHashes, nBands, minhashThreshold)
        val w = Window.partitionBy("cluster_rep")
        labels.select(col("doc_id"), col("cluster_rep"),
          count(lit(1)).over(w).as("cluster_size"))
          .orderBy("doc_id")
      },
      clusterOracle),

    // xxhash64-based SimHash. The raw pair set can NEVER hash-match a
    // DuckDB oracle: xxhash64 has no DuckDB mirror, and the pair set at
    // the hamming cut is hash-FAMILY-dependent (empirically only ~27%
    // of the md5 twin's pairs coincide — the near-threshold pairs flip
    // with the word-hash family). So the query emits the DuckDB-
    // checkable CALIBRATION instead: the corpus size (exact,
    // SQL-mirrored) plus booleans pinning (a) the hamming cut is
    // honored, (b) LSH actually filters (pairs ≪ all-pairs), and
    // (c) the xx pair set stays within loose structural agreement of
    // the fully-oracled md5 twin (count ratio in [¼, 4], overlap ≥ 10%
    // — observed ~0.52 / ~0.27 across SFs). Exact per-pair semantics
    // stay pinned by DedupSpec; q_dedup_simhash_md5 carries the full
    // hash oracle for the identical pipeline shape.
    // CORPUS DEPENDENCE: the [¼,4] / 10% bounds are tuned against the
    // driver's sf* documents fixture (TESTDATA.md) with ~2× headroom
    // over the observed ratios. On a regenerated fixture or a new scale
    // factor these gates can fail on a HEALTHY pipeline — that is a
    // recalibration signal, not a bug: re-measure n_xx/n_md and n_ov/
    // n_md at the new corpus and widen the literals here (the oracle is
    // constant-true, so only this side moves). The query deliberately
    // runs the md5 twin too (its bench time ≈ 2× a single pipeline);
    // the twin's substrate is shared via StageCache in bench mode.
    QueryDef("q_dedup_simhash",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val xx = Dedup.simHashPairs(docs, "doc_id", "text", 10)
          .select(col("d1"), col("d2"), col("hamming"))
        val md = Dedup.simHashPairsMd5(docs, "doc_id", "text", 10)
          .select(col("d1"), col("d2"))
        val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
        val xxStats = broadcast(xx.agg(count(lit(1)).as("n_xx"),
          max("hamming").as("max_ham")))
        val mdStats = broadcast(md.agg(count(lit(1)).as("n_md")))
        val ovStats = broadcast(xx.join(md, Seq("d1", "d2"), "left_semi")
          .agg(count(lit(1)).as("n_ov")))
        nDocs.crossJoin(xxStats).crossJoin(mdStats).crossJoin(ovStats)
          .select(col("n_docs"),
            (col("n_xx") > 0L).as("pairs_found"),
            (col("max_ham") <= 10).as("hamming_cut_ok"),
            (col("n_xx").cast("double") <=
              col("n_docs").cast("double") * (col("n_docs") - 1L) / 8.0)
              .as("lsh_filters"),
            (col("n_xx").cast("double") >= col("n_md") * 0.25 &&
              col("n_xx").cast("double") <= col("n_md") * 4.0)
              .as("family_count_agree"),
            (col("n_ov").cast("double") >= col("n_md") * 0.10)
              .as("family_overlap_ok"))
      },
      """SELECT count(*)::BIGINT AS n_docs, true AS pairs_found,
           true AS hamming_cut_ok, true AS lsh_filters,
           true AS family_count_agree, true AS family_overlap_ok
         FROM documents"""),

    // md5-derived 60-bit SimHash: identical banded-LSH pipeline, but every
    // stage (word hash → per-bit votes → fingerprint → 4×15-bit bands →
    // hamming filter) is mirrored in DuckDB, giving the SimHash family a
    // full hash-checked oracle rather than a rows-only count.
    QueryDef("q_dedup_simhash_md5",
      (s, d) => Dedup.simHashPairsMd5(Tables.documents(s, d), "doc_id", "text", 10)
        .orderBy("d1", "d2"),
      simhashMd5Oracle),

    // Embedding-cosine near-duplicate pairs (builder-prompt dedup family).
    // Brute-force all-pairs with the codegen'd cosine — exact; the
    // LSH-bucketed (q_similarity_ann) and IVF (q_similarity_ivf) queries
    // are the recall-tradeoff scale path for the same computation.
    QueryDef("q_dedup_embcos",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
        val a = e.select(col("vec_id").as("d1"), col("embedding").as("emb1"))
        val b = e.select(col("vec_id").as("d2"), col("embedding").as("emb2"))
        a.join(b, col("d1") < col("d2"))
          .select(col("d1"), col("d2"),
            call_function("cosine_sim", col("emb1"), col("emb2")).as("cosine_sim"))
          .filter(col("cosine_sim") >= 0.4)
          .orderBy("d1", "d2")
      },
      s"""SELECT a.vec_id AS d1, b.vec_id AS d2,
           ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cosine_sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.4
         ORDER BY d1, d2"""),

    // Scale-path twin of q_dedup_embcos: sign-bucket LSH prefilter (pairs
    // must share the 4-bit sign bucket) + the same exact cosine verify.
    // Candidate volume is Σ bucket² ≈ N²/2^bits instead of N², and the
    // bucket equi-join shuffles/broadcasts on an 8-byte key — the plan
    // that survives 100 TB where the all-pairs baseline cannot. The
    // oracle mirrors the bucket prefilter exactly, so LSH recall cancels
    // out and results hash-match; recall vs the exact baseline is the
    // standard LSH trade (a pair split by a sign flip in the first 4 dims
    // is missed).
    QueryDef("q_dedup_embcos_bucketed",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val nBits = 4
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBucket(col("embedding"), nBits))
        val a = e.select(col("vec_id").as("d1"), col("embedding").as("emb1"),
          col("bucket"))
        val b = e.select(col("vec_id").as("d2"), col("embedding").as("emb2"),
          col("bucket"))
        a.join(b, Seq("bucket"))
          .filter(col("d1") < col("d2"))
          .select(col("d1"), col("d2"), col("bucket").cast("long").as("bucket"),
            call_function("cosine_sim", col("emb1"), col("emb2")).as("cosine_sim"))
          .filter(col("cosine_sim") >= 0.4)
          .orderBy("d1", "d2")
      },
      s"""WITH e AS (SELECT vec_id, embedding,
                 ${Similarity.signBucketSql("embedding", 4)}::BIGINT AS bucket
               FROM embeddings)
         SELECT a.vec_id AS d1, b.vec_id AS d2, a.bucket,
           ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cosine_sim
         FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         WHERE ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.4
         ORDER BY d1, d2"""),

    QueryDef("q_text_jaccard",
      (s, d) => {
        val ws = col("ws")
        // zip_with/slice bigrams: short-doc-safe, single-word docs get an
        // empty set (DuckDB's range(1, 1) is empty already — oracles agree)
        val bigrams = TextAnalysis.bigrams(ws, " ")
        val sets = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"), array_distinct(bigrams).as("sset"))
        val inter = size(array_intersect(col("x.sset"), col("y.sset")))
        sets.as("x").join(sets.as("y"), col("y.doc_id") === col("x.doc_id") + 1)
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            (inter.cast("double") /
              (size(col("x.sset")) + size(col("y.sset")) - inter)).as("jaccard"))
          .orderBy("d1")
      },
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS sset
                FROM w)
         SELECT x.doc_id AS d1, y.doc_id AS d2,
           len(list_intersect(x.sset, y.sset))::DOUBLE
             / (len(x.sset) + len(y.sset) - len(list_intersect(x.sset, y.sset))) AS jaccard
         FROM sh x JOIN sh y ON y.doc_id = x.doc_id + 1 ORDER BY d1"""),

    // Character 5-gram Jaccard between consecutive docs — the char-level
    // n-gram dedup granularity (word-level variants: q_text_jaccard,
    // q_dedup_minhash).
    QueryDef("q_text_chargram",
      (s, d) => {
        val grams = array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
          i => col("text").substr(i, lit(5))))
        val sets = Tables.documentsBalanced(s, d)
          .select(col("doc_id"), grams.as("gset"))
        val inter = size(array_intersect(col("x.gset"), col("y.gset")))
        sets.as("x").join(sets.as("y"), col("y.doc_id") === col("x.doc_id") + 1)
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            (inter.cast("double") /
              (size(col("x.gset")) + size(col("y.gset")) - inter)).as("jaccard"))
          .orderBy("d1")
      },
      """WITH g AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
               i -> substring(text, i, 5))) AS gset
           FROM documents)
         SELECT x.doc_id AS d1, y.doc_id AS d2,
           len(list_intersect(x.gset, y.gset))::DOUBLE
             / (len(x.gset) + len(y.gset) - len(list_intersect(x.gset, y.gset))) AS jaccard
         FROM g x JOIN g y ON y.doc_id = x.doc_id + 1 ORDER BY d1"""),

    // Brute-force cosine top-k: the exactness baseline. Query vectors are
    // broadcast; the big side is scanned once, no shuffle before the
    // per-query top-k window. Uses the codegen'd native Expression
    // (CosineSimExpr) — bit-compatible with Similarity.cosine and the oracle.
    QueryDef("q_similarity_topk",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            call_function("cosine_sim", col("embedding"), col("q_emb")).as("cosine_sim"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 10)
          .select("q_id", "rn", "neighbor_id", "cosine_sim")
          .orderBy("q_id", "rn")
      },
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
         s AS (SELECT q_id, e.vec_id AS neighbor_id,
                 ${Similarity.cosineSql("e.embedding", "q.q_emb")} AS cosine_sim
               FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM s)
         SELECT q_id, rn, neighbor_id, cosine_sim FROM r WHERE rn <= 10
         ORDER BY q_id, rn"""),

    // LSH-bucketed ANN: sign-bit bucket equi-join instead of a full cross
    // product — the scale path (candidates ≈ N/2^bits per query).
    QueryDef("q_similarity_ann",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBucket(col("embedding"), 4))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("bucket").as("q_bucket"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
        e.join(broadcast(q), col("bucket") === col("q_bucket") &&
            col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("bucket"),
            call_function("cosine_sim", col("embedding"), col("q_emb")).as("cosine_sim"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("q_id", "rn", "neighbor_id", "bucket", "cosine_sim")
          .orderBy("q_id", "rn")
      },
      s"""WITH e AS (SELECT vec_id, embedding,
                 ${Similarity.signBucketSql("embedding", 4)}::BIGINT AS bucket
               FROM embeddings),
         q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
               FROM e WHERE vec_id < 5),
         s AS (SELECT q_id, e.vec_id AS neighbor_id, e.bucket,
                 ${Similarity.cosineSql("e.embedding", "q.q_emb")} AS cosine_sim
               FROM e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM s)
         SELECT q_id, rn, neighbor_id, bucket, cosine_sim FROM r WHERE rn <= 3
         ORDER BY q_id, rn"""),

    // Multi-probe LSH ANN: each query searches its own sign bucket PLUS
    // every 1-bit-flip neighbor bucket (5 of 16) — the standard recall
    // repair for sign-LSH on weakly-clustered embeddings (measured
    // chance-level recall single-bucket on this corpus, OpsSpec).
    // Candidates ≈ 5N/16 instead of N/16; the probe fan-out rides the
    // broadcast query side, the big side still scans once.
    QueryDef("q_similarity_ann_multiprobe",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBucket(col("embedding"), 4))
        val masks = Seq(0, 1, 2, 4, 8)
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            explode(array(masks.map(m =>
              col("bucket").bitwiseXOR(lit(m))): _*)).as("probe_bucket"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
        e.join(broadcast(probes), col("bucket") === col("probe_bucket") &&
            col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            call_function("cosine_sim", col("embedding"), col("q_emb")).as("cosine_sim"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("q_id", "rn", "neighbor_id", "cosine_sim")
          .orderBy("q_id", "rn")
      },
      s"""WITH e AS (SELECT vec_id, embedding,
                 ${Similarity.signBucketSql("embedding", 4)}::BIGINT AS bucket
               FROM embeddings),
         m(mask) AS (VALUES (0), (1), (2), (4), (8)),
         q AS (SELECT vec_id AS q_id, embedding AS q_emb,
                 xor(bucket, mask) AS probe_bucket
               FROM e, m WHERE vec_id < 5),
         s AS (SELECT q_id, e.vec_id AS neighbor_id,
                 ${Similarity.cosineSql("e.embedding", "q.q_emb")} AS cosine_sim
               FROM e JOIN q ON e.bucket = q.probe_bucket AND e.vec_id <> q.q_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM s)
         SELECT q_id, rn, neighbor_id, cosine_sim FROM r WHERE rn <= 3
         ORDER BY q_id, rn"""),

    // IVF-style ANN — the coarse-quantization scale path the LSH variant
    // complements: assign every vector to its nearest of K centroids (here
    // a deterministic centroid pick standing in for k-means training; the
    // assignment/probe dataflow is the real thing), then search only the
    // query's nprobe=2 nearest centroid lists. Candidate work per query is
    // N·nprobe/K instead of N.
    QueryDef("q_similarity_ivf",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cvec"))
        val dists = (src: org.apache.spark.sql.DataFrame) =>
          src.crossJoin(broadcast(cents))
            .select(col("vec_id"), col("embedding"), col("cid"),
              Similarity.l2sq(col("embedding"), col("cvec")).as("dist"))
        // Nearest-centroid assignment as a partial-aggregating min_by (the
        // (dist, cid) struct ordering matches the former window's
        // dist-asc/cid-asc tiebreak): map-side combine collapses the N×K
        // distance rows before the shuffle, where the row_number window it
        // replaces shuffled and sorted all of them. The nprobe=2 probe
        // list needs a rank, but only for the 5 query vectors — the
        // per-vec_id window makes filter-then-rank ≡ rank-then-filter, so
        // the full-N assignment is computed exactly once.
        val assigned = dists(e)
          .groupBy("vec_id")
          .agg(min_by(struct(col("cid"), col("embedding")),
            struct(col("dist"), col("cid"))).as("best"))
          .select(col("vec_id"), col("best.embedding").as("embedding"),
            col("best.cid").as("cid"))
        val aw = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cid").asc)
        val probes = dists(e.filter(col("vec_id") < 5))
          .withColumn("arn", row_number().over(aw))
          .filter(col("arn") <= 2)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cid"))
        val w = Window.partitionBy("q_id")
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
      s"""WITH cents AS (SELECT vec_id::INTEGER AS cid, embedding AS cvec
                         FROM embeddings WHERE vec_id < 16),
         assign AS (SELECT e.vec_id, e.embedding, c.cid,
                      ${Similarity.l2sqSql("e.embedding", "c.cvec")} AS dist,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${Similarity.l2sqSql("e.embedding", "c.cvec")} ASC, c.cid ASC) AS arn
                    FROM embeddings e CROSS JOIN cents c),
         assigned AS (SELECT vec_id, embedding, cid FROM assign WHERE arn = 1),
         probes AS (SELECT vec_id AS q_id, embedding AS q_emb, cid
                    FROM assign WHERE vec_id < 5 AND arn <= 2),
         s AS (SELECT p.q_id, a.vec_id AS neighbor_id, a.cid,
                 ${Similarity.cosineSql("a.embedding", "p.q_emb")} AS cosine_sim
               FROM assigned a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.q_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM s)
         SELECT q_id, rn, neighbor_id, cid, cosine_sim FROM r WHERE rn <= 5
         ORDER BY q_id, rn"""),

    QueryDef("q_text_tokens",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(30),
      """SELECT word, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
         GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 30"""),

    QueryDef("q_text_quality",
      (s, d) => {
        val t = col("text")
        Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.tokenCount(t).as("n_tokens"),
          length(t).cast("long").as("n_chars"),
          TextAnalysis.avgWordLen(t).as("avg_word_len"),
          TextAnalysis.stopwordRatio(t).as("stopword_ratio"),
          TextAnalysis.qualityScore(t).as("quality_score"))
          .orderBy("doc_id")
      },
      s"""SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           length(text)::BIGINT AS n_chars,
           length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS avg_word_len,
           (${TextAnalysis.hitCountSql("text", TextAnalysis.enStopwords)})::DOUBLE
             / len(string_split(text, ' ')) AS stopword_ratio,
           least(1.0, len(string_split(text, ' '))::DOUBLE / 100.0)
             * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                / len(string_split(text, ' '))) AS quality_score
         FROM documents ORDER BY doc_id"""),

    QueryDef("q_text_langid",
      (s, d) => {
        val t = col("text")
        val hitCols = TextAnalysis.langMarkers.map { case (lang, ws) =>
          TextAnalysis.hitCount(t, ws).as(s"hits_$lang")
        }
        Tables.documents(s, d).select(
          (col("doc_id") +: col("lang").as("labeled_lang") +:
            TextAnalysis.langId(t).as("predicted_lang") +: hitCols): _*)
          .orderBy("doc_id")
      },
      s"""SELECT doc_id, lang AS labeled_lang,
           ${TextAnalysis.langIdSql("text")} AS predicted_lang,
           ${TextAnalysis.langMarkers.map { case (lang, ws) =>
             s"${TextAnalysis.hitCountSql("text", ws)} AS hits_$lang" }.mkString(", ")}
         FROM documents ORDER BY doc_id"""),

    // Token counting, whitespace vs BPE-ish regex segmentation (word /
    // number / punctuation-run classes — the shape GPT-2-style
    // pre-tokenizers use).
    QueryDef("q_text_bpe",
      (s, d) => {
        val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
        Tables.documents(s, d).select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
            .as("n_bpe_tokens"),
          (length(col("text")).cast("double") /
            size(regexp_extract_all(col("text"), lit(pat), lit(0))))
            .as("chars_per_token"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_bpe_tokens,
           length(text)::DOUBLE
             / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS chars_per_token
         FROM documents ORDER BY doc_id"""),

    // Frame sampling over an opaque payload: fixed-width windows, every
    // 3rd kept — the video-frame-sample batching shape with a text-backed
    // payload (windows == byte windows for this ASCII corpus).
    QueryDef("q_multimodal_frames",
      (s, d) => {
        val w = 32
        val nFrames = ceil(length(col("text")).cast("double") / w).cast("int")
        val sampled = transform(
          filter(sequence(lit(0), nFrames - 1), i => i % 3 === 0),
          i => col("text").substr(i * w + 1, lit(w)))
        Tables.documents(s, d).select(
          col("doc_id"),
          nFrames.cast("long").as("n_frames"),
          size(sampled).cast("long").as("n_sampled"),
          md5(concat_ws("", sampled).cast("binary")).as("sample_md5"))
          .orderBy("doc_id")
      },
      """WITH f AS (
           SELECT doc_id, ceil(length(text)::DOUBLE / 32)::INTEGER AS n_frames,
             list_transform(
               list_filter(range(0, ceil(length(text)::DOUBLE / 32)::INTEGER), i -> i % 3 = 0),
               i -> substring(text, i * 32 + 1, 32)) AS frames
           FROM documents)
         SELECT doc_id, n_frames::BIGINT AS n_frames,
           len(frames)::BIGINT AS n_sampled,
           md5(list_aggregate(frames, 'string_agg', '')) AS sample_md5
         FROM f ORDER BY doc_id"""),

    QueryDef("q_text_fingerprint",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("content_md5"),
        TextAnalysis.rollingHash(col("text")).as("rolling_hash"))
        .orderBy("doc_id"),
      s"""SELECT doc_id, md5(text) AS content_md5,
           ${TextAnalysis.rollingHashSql("text")} AS rolling_hash
         FROM documents ORDER BY doc_id"""),

    QueryDef("q_multimodal_meta",
      (s, d) => {
        val docs = Multimodal.withPayload(Tables.documents(s, d), "text")
        docs.select(
          col("doc_id"),
          length(col("payload")).cast("long").as("byte_len"),
          lower(substring(hex(col("payload")), 1, 16)).as("hex_prefix"),
          md5(col("payload")).as("content_md5"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
           octet_length(text::BLOB)::BIGINT AS byte_len,
           lower(substring(hex(text::BLOB), 1, 16)) AS hex_prefix,
           md5(text) AS content_md5
         FROM documents ORDER BY doc_id"""),

    // REAL codec round trip: javax.imageio PNG encode → bytes → NN
    // downsample → re-encode → decode. Fixture pixels have the closed
    // form (x*31 + y*7 + c*13 + id) mod 256, so the oracle recomputes the
    // resized image's pixel sum (stride-2 samples) with no image library.
    QueryDef("q_multimodal_resize",
      (s, d) => Multimodal.resize(
        Multimodal.pngPayload(Tables.documents(s, d), "doc_id"), "doc_id", 2)
        .orderBy("doc_id"),
      """WITH dims AS (
           SELECT doc_id, (doc_id % 13 + 4)::INTEGER AS w, (doc_id % 11 + 3)::INTEGER AS h
           FROM documents),
         d2 AS (
           SELECT doc_id, w, h,
             ((w + 1) // 2)::INTEGER AS ow, ((h + 1) // 2)::INTEGER AS oh
           FROM dims),
         px AS (SELECT *, unnest(generate_series(0, ow - 1)) AS x FROM d2),
         pxy AS (SELECT *, unnest(generate_series(0, oh - 1)) AS y FROM px),
         pxyc AS (SELECT *, unnest([0, 1, 2]) AS c FROM pxy)
         SELECT doc_id, w AS orig_width, h AS orig_height,
           ow AS out_width, oh AS out_height,
           SUM((x*2*31 + y*2*7 + c*13 + doc_id) % 256)::BIGINT AS pixel_sum
         FROM pxyc GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id"""),

    // REAL codec decode: per-partition javax.imageio PNG reader over
    // deterministic fixture PNGs; the oracle expands the pixel formula.
    QueryDef("q_multimodal_decode",
      (s, d) => Multimodal.decode(
        Multimodal.pngPayload(Tables.documents(s, d), "doc_id"), "doc_id")
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.channels").as("channels"),
          col("meta.pixel_sum").as("pixel_sum"))
        .orderBy("doc_id"),
      """WITH dims AS (
           SELECT doc_id, (doc_id % 13 + 4)::INTEGER AS width, (doc_id % 11 + 3)::INTEGER AS height
           FROM documents),
         px AS (SELECT *, unnest(generate_series(0, width - 1)) AS x FROM dims),
         pxy AS (SELECT *, unnest(generate_series(0, height - 1)) AS y FROM px),
         pxyc AS (SELECT *, unnest([0, 1, 2]) AS c FROM pxy)
         SELECT doc_id, width, height, 3::INTEGER AS channels,
           SUM((x*31 + y*7 + c*13 + doc_id) % 256)::BIGINT AS pixel_sum
         FROM pxyc GROUP BY 1, 2, 3 ORDER BY doc_id"""),

    // Perceptual image dedup: dHash (9×8 nearest luma grid → 64
    // horizontal-gradient sign bits) over the REAL decoded PNGs, then
    // duplicate-group sizes by exact hash — the image-side analogue of
    // content_md5 text dedup, with Hamming-banded near-dup as the
    // natural extension (OpsSpec pins the ±1-pixel robustness). The
    // hash is integer-only (nearest sampling, BT.601 integer luma), so
    // the oracle can replay it from the fixture's closed-form pixels —
    // a fully hash-verified perceptual pipeline, not a rows-only one.
    // Scale: per-partition codec reuse, 8-byte hashes shuffle, never
    // pixels.
    QueryDef("q_multimodal_phash",
      (s, d) => {
        val ph = Multimodal.phash(
          Multimodal.pngPayload(Tables.documents(s, d), "doc_id"), "doc_id")
        val sizes = ph.groupBy("phash").agg(count(lit(1)).as("group_size"))
        ph.join(sizes, "phash")
          .select(col("doc_id"), col("phash"), col("group_size"))
          .orderBy("doc_id")
      },
      """WITH dims AS (
        |  SELECT doc_id, (doc_id % 13 + 4)::BIGINT AS w,
        |    (doc_id % 11 + 3)::BIGINT AS h
        |  FROM documents),
        |gy AS (SELECT *, unnest(range(8)) AS y FROM dims),
        |gx AS (SELECT *, unnest(range(1, 9)) AS x FROM gy),
        |bits AS (
        |  SELECT doc_id, y, x,
        |    (((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) % 256) * 299
        |      + ((((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 13) % 256) * 587
        |      + ((((x * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 26) % 256) * 114
        |      AS lum1,
        |    ((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) % 256) * 299
        |      + (((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 13) % 256) * 587
        |      + (((((x - 1) * w // 9) * 31 + (y * h // 8) * 7 + doc_id) + 26) % 256) * 114
        |      AS lum0
        |  FROM gx),
        |ph AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN lum1 > lum0 THEN
        |        CASE WHEN y * 8 + (x - 1) = 63
        |             THEN (-9223372036854775807 - 1)::BIGINT
        |             ELSE 1::BIGINT << (y * 8 + (x - 1))::INT END
        |        ELSE 0 END)::BIGINT AS phash
        |  FROM bits GROUP BY doc_id),
        |gs AS (SELECT phash, count(*) AS group_size FROM ph GROUP BY phash)
        |SELECT doc_id, ph.phash, group_size
        |FROM ph JOIN gs ON ph.phash = gs.phash
        |ORDER BY doc_id""".stripMargin),

    // LSH quality evaluation — the recall/precision readout every dedup
    // pipeline reports before trusting its bands: on a LABELED SUBSET
    // (doc_id < 100 — exact all-pairs Jaccard is affordable there and
    // ONLY there; not being able to afford it corpus-wide is the whole
    // reason LSH exists), compare the 16-hash/4-band candidate set
    // against exact ground truth at three Jaccard tiers. Candidates
    // carry their exact verified Jaccard, so hits are a conditional
    // count, and every output number is a ratio of exact integers.
    // Expected shape: recall ≈ 1 at J ≥ 0.9 (the bands are tuned
    // there, 1−(1−J⁴)⁴), decaying at 0.7/0.5 — the measured curve IS
    // the tuning evidence. The subset all-pairs join broadcasts 100
    // docs; the LSH side is the production candidate pipeline
    // unchanged.
    QueryDef("q_dedup_lsh_eval",
      (s, d) => {
        val sub = Tables.documents(s, d).filter(col("doc_id") < 100)
        val cand = Dedup.minHashPairs(sub, "doc_id", "text",
          nHashes, nBands, threshold = 0.0)
        val candAgg = cand.groupBy().agg(
          count(lit(1)).as("n_cand"),
          sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("hit50"),
          sum(when(col("jaccard") >= 0.7, 1L).otherwise(0L)).as("hit70"),
          sum(when(col("jaccard") >= 0.9, 1L).otherwise(0L)).as("hit90"))
        val sets = sub.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ws"))
        val inter = size(array_intersect(col("a.ws"), col("b.ws")))
        val truth = sets.as("a").join(sets.as("b"),
            col("a.doc_id") < col("b.doc_id"))
          .select((inter.cast("double") /
            (size(col("a.ws")) + size(col("b.ws")) - inter)).as("j"))
        val truthAgg = truth.groupBy().agg(
          sum(when(col("j") >= 0.5, 1L).otherwise(0L)).as("t50"),
          sum(when(col("j") >= 0.7, 1L).otherwise(0L)).as("t70"),
          sum(when(col("j") >= 0.9, 1L).otherwise(0L)).as("t90"))
        candAgg.crossJoin(truthAgg).select(
          col("n_cand"), col("t50"), col("t70"), col("t90"),
          col("hit50"), col("hit70"), col("hit90"),
          (col("hit50").cast("double") / col("t50").cast("double")).as("recall50"),
          (col("hit70").cast("double") / col("t70").cast("double")).as("recall70"),
          (col("hit90").cast("double") / col("t90").cast("double")).as("recall90"))
      }, {
        val rows = nHashes / nBands
        val sigCols = (0 until nHashes).map(sigCol).mkString(", ")
        val bandSelects = (0 until nBands).map { j =>
          val cat = (0 until rows).map(r => s"s${j * rows + r}::VARCHAR")
            .mkString(" || '|' || ")
          s"SELECT doc_id, $j AS band_idx, md5($cat) AS bucket FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM sub),
sig AS (SELECT doc_id, $sigCols FROM w GROUP BY doc_id),
band AS ($bandSelects),
cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM band x
         JOIN band y ON x.band_idx = y.band_idx AND x.bucket = y.bucket
           AND x.doc_id < y.doc_id),
ws AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s FROM sub),
v AS (SELECT d1, d2,
        len(list_intersect(x.s, y.s))::DOUBLE
          / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
      FROM cand JOIN ws x ON d1 = x.doc_id JOIN ws y ON d2 = y.doc_id),
ca AS (SELECT count(*) AS n_cand,
         sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS hit50,
         sum(CASE WHEN jaccard >= 0.7 THEN 1 ELSE 0 END) AS hit70,
         sum(CASE WHEN jaccard >= 0.9 THEN 1 ELSE 0 END) AS hit90
       FROM v),
truth AS (SELECT len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
          FROM ws a JOIN ws b ON a.doc_id < b.doc_id),
ta AS (SELECT sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS t50,
         sum(CASE WHEN j >= 0.7 THEN 1 ELSE 0 END) AS t70,
         sum(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END) AS t90
       FROM truth)
SELECT n_cand::BIGINT AS n_cand, t50::BIGINT AS t50, t70::BIGINT AS t70,
  t90::BIGINT AS t90, hit50::BIGINT AS hit50, hit70::BIGINT AS hit70,
  hit90::BIGINT AS hit90,
  hit50::DOUBLE / t50::DOUBLE AS recall50,
  hit70::DOUBLE / t70::DOUBLE AS recall70,
  hit90::DOUBLE / t90::DOUBLE AS recall90
FROM ca CROSS JOIN ta"""
      }),
  )
}
