package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data pipelines.
  *
  * Scale design (the point of each algorithm at 100 TB):
  *   - [[exact]]: hash-groupBy on a digest of the content, never on the
  *     content itself — the shuffle carries 16-byte keys, not documents.
  *   - [[minHashPairs]]: MinHash+LSH — candidate generation is a self-join
  *     on (band, bucket) keys, so cost is Σ bucket² instead of N²; the
  *     exact-Jaccard verify runs only on candidates. All stages are
  *     shuffles on small keys + one join; no driver-side state.
  *   - [[simHash64]] + [[simHashPairs]]: 64-bit SimHash with banded
  *     hamming-candidate join — same LSH shape, bit-level similarity.
  *
  * Hash choice: [[minHashPairs]] keys its permutations off md5 truncated
  * to 60 bits and read as a BIGINT (SQL-portable — DuckDB mirrors it as
  * `('0x' || substring(md5(w), 1, 15))::BIGINT`, the same trick the
  * simhash oracle uses). Fixed-length lowercase hex sorts identically to
  * its numeric value, so the BIGINT min IS the hex-prefix min, and the
  * signature aggregation/shuffle carries 8-byte longs instead of 32-char
  * strings; production would switch to xxhash64 (no hex detour at all)
  * without changing the dataflow — [[simHash64]] does exactly that.
  */
object Dedup {

  /** Exact dedup: one representative (min id) + multiplicity per distinct
    * content digest. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol).cast("binary")).as("content_md5"))
      .groupBy("content_md5")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "content_md5")

  /** Distinct word-set shingles per doc, SORTED (unigram granularity;
    * callers can pre-transform `textCol` for n-gram shingling, or pass
    * an already-tokenized `array<string>` column with
    * `tokenized = true` and skip the split). Sorting costs once per
    * document and unlocks merge-based intersection in the
    * pair-verification inner loop. */
  private def wordSet(textCol: Column, tokenized: Boolean = false): Column =
    array_sort(array_distinct(if (tokenized) textCol else split(textCol, " ")))

  /** Seed-i permutation hash of a word: md5's first 15 hex chars (60
    * bits) as a BIGINT. Lexicographic order on fixed-length lowercase hex
    * equals numeric order, so `min` over these longs picks the same
    * winner as `min` over the hex prefixes — and the oracle reproduces
    * the value exactly with `('0x' || substring(md5(...), 1, 15))::BIGINT`. */
  private def permHash(i: Int, word: Column): Column =
    conv(substring(md5(concat(lit(s"$i|"), word).cast("binary")), 1, 15),
      16, 10).cast("long")

  /** MinHash signature frame: (doc_id, s0..s{n-1}) — the reusable sketch
    * underlying [[minHashPairs]]; exposed for estimator-style consumers. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16): DataFrame = {
    // One shuffle, map-side combined: the min-aggregation state is 16
    // longs per doc per mapper. A zero-shuffle array_min(transform(...))
    // projection was measured 2× SLOWER here (sf0.1 solo 3.2 → 6.4 s):
    // higher-order functions are evaluated outside whole-stage codegen,
    // so its 16 identical wordSet subtrees get no subexpression
    // elimination and the split/sort re-runs 16× per row. (minHashPairs
    // CAN fuse — its word sets are materialized behind a checkpoint
    // barrier, so only the hashing repeats there.)
    val words = docs.select(col(idCol).as("doc_id"),
      explode(wordSet(col(textCol))).as("word"))
    val sigExprs = (0 until numHashes).map(i =>
      min(permHash(i, col("word"))).as(s"s$i"))
    words.groupBy("doc_id").agg(sigExprs.head, sigExprs.tail: _*)
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Executes on word-set REPRESENTATIVES: documents with identical word
    * sets share minhash signatures and band buckets by construction, so
    * running LSH per distinct set and expanding groups afterwards produces
    * byte-identical output to the naive per-document algorithm (which the
    * DuckDB oracle still expresses) while collapsing the degenerate
    * everything-matches-everything cliques that otherwise blow the bucket
    * self-join up quadratically. Candidates dedup while still 8-byte
    * digest pairs, a slim (digest, size) ratio prefilter kills most of
    * them, and only the survivors join the word-set arrays — via
    * SHUFFLE_HASH, never a mandatory broadcast (the set table scales with
    * the corpus; a forced broadcast would OOM at 100 TB).
    *
    * Skew guard (`bucketCap` > 0): a skewed shingle distribution can pile
    * thousands of distinct sets into one (band, bucket) and the candidate
    * self-join degenerates toward bucket² on that key. The cap keeps only
    * the `bucketCap` sets with the SMALLEST representative doc id per
    * (band, bucket) — deterministic, so a DuckDB oracle can mirror the
    * rule exactly and recall effects cancel — bounding any bucket's
    * candidate contribution at cap·(cap−1)/2. The row_number ≤ K filter
    * plans as WindowGroupLimit (partial top-K per mapper before the
    * shuffle), so a mega-bucket never materializes in one task's sort.
    * 0 disables the cap (exact LSH recall — the reference semantics).
    *
    * @param numHashes signature length (must be bands * rowsPerBand)
    * @param bands     LSH bands; candidate pairs share ≥1 band bucket
    * @param threshold exact word-set Jaccard cutoff applied to candidates
    * @param bucketCap max distinct word-sets admitted per (band, bucket)
    */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 16, bands: Int = 4,
                   threshold: Double = 0.9, bucketCap: Int = 0,
                   tokenized: Boolean = false): DataFrame = {
    val (members, verified) =
      minHashDigestPairs(docs, idCol, textCol, numHashes, bands, threshold,
        bucketCap, tokenized)
    // expand digests back to document pairs:
    // (a) cross-digest verified pairs → all member cross products
    val cross = verified
      .join(members.as("m1"), col("g1") === col("m1.digest"))
      .join(members.as("m2"), col("g2") === col("m2.digest"))
      .select(
        least(col("m1.doc_id"), col("m2.doc_id")).as("d1"),
        greatest(col("m1.doc_id"), col("m2.doc_id")).as("d2"),
        col("jaccard"))
    // (b) identical word sets (same digest) → all pairs, jaccard exactly 1.0
    val within = members.as("m1").join(members.as("m2"),
        col("m1.digest") === col("m2.digest") &&
          col("m1.doc_id") < col("m2.doc_id"))
      .select(col("m1.doc_id").as("d1"), col("m2.doc_id").as("d2"),
        lit(1.0).as("jaccard"))
    if (threshold <= 1.0) cross.unionAll(within) else cross
  }

  /** The digest-granular core of [[minHashPairs]]: returns
    * `(members, verifiedPairs)` where `members` maps every document to its
    * canonical word-set digest and `verifiedPairs` holds the
    * Jaccard-verified DISTINCT-SET pairs `(g1, g2, jaccard)`. Consumers
    * that only need component structure ([[dedupClusters]]) work here and
    * never materialize the member cross products — identical word sets
    * form cliques, so the doc-level expansion is quadratic per digest
    * group (measured 961k doc pairs vs 45k digest pairs at sf0.1) while
    * adding zero information beyond "same digest ⇒ same cluster". */
  def minHashDigestPairs(docs: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 16, bands: Int = 4,
                         threshold: Double = 0.9, bucketCap: Int = 0,
                         tokenized: Boolean = false)
      : (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    graft.functions.SortedIntersectSize.register(docs.sparkSession)

    // doc → canonical word-set digest; one representative row per digest.
    // The digest is an INTERNAL join/grouping key (never surfaced), so an
    // 8-byte xxhash64 beats a 32-char md5 hex string in every shuffle.
    //
    // LAZY localCheckpoint: this frame fans out to members + sets, and
    // sets again to the verify x/y sides — without materialization each
    // consumer re-evaluates the tokenize/sort/hash pipeline from the scan
    // (exchange reuse does not cover these branches; measured ~2 extra
    // full evaluations). Blocks are distributed (not a broadcast), sized
    // one row per document, and freed by the context cleaner when the
    // plan is released.
    // StageCache.stage == lazy localCheckpoint unless the session
    // opted into the disk stage cache (Bench does): then this frame —
    // identical across q_dedup_minhash / _capped / q_dedup_cluster —
    // is computed ONCE per session and parquet-read by the others.
    val byDigest = StageCache.stage(docs.select(col(idCol).as("doc_id"),
      xxhash64(concat_ws(" ", wordSet(col(textCol), tokenized))).as("digest"),
      wordSet(col(textCol), tokenized).as("ws")))
    val members = byDigest.select("doc_id", "digest")
    val sets = byDigest.select("digest", "ws").dropDuplicates("digest")

    // numHashes independent permutations simulated by seed-prefixed md5,
    // truncated to 60-bit BIGINTs ([[permHash]]), computed IN PLACE as a
    // projection over the checkpointed word-set arrays:
    // s_i = array_min(transform(ws, w => permHash(i, w))). The previous
    // shape (explode → distinct-vocab md5 join → per-digest min groupBy)
    // hashed each vocabulary word once, but paid three data-motion steps
    // for it — a vocab distinct shuffle, a join that re-shuffles every
    // (digest, word) occurrence once the vocab outgrows broadcast, and
    // the signature groupBy. At cluster scale those shuffles are the
    // bottleneck; 16 codegen'd md5s per distinct word occurrence are
    // embarrassingly parallel and run where the data already sits.
    // (Measured: sf0.1 solo unchanged at ~4.7 s, but at the 10× dense
    // corpus the fusion is 5–6×: minhash 322.8→54.2 s, cluster
    // 287.8→60.8 s, exponents 1.82→0.98 / 1.51→0.81 — the old by-WORD
    // shuffle spread ~1M occurrence rows over a 31-key space, one
    // straggler partition per word, skew that grew with the corpus
    // while the key space stayed fixed. SCALING.md §measured.)
    // `ws` is a materialized column of
    // the checkpoint barrier, so the 16 transforms read one array
    // attribute — CollapseProject cannot re-inline its construction.
    // Null-text docs (null ws) produced no exploded rows under the old
    // shape; the filter keeps that behavior identical.
    val sigExprs = (0 until numHashes).map(i =>
      array_min(transform(col("ws"), w => permHash(i, w))).as(s"s$i"))
    // lazy checkpoint: the banded-bucket frame below self-joins, and the
    // signature projection would otherwise run once per join side
    val sigs = StageCache.stage(sets.where(col("ws").isNotNull)
      .select(col("digest") +: sigExprs: _*))

    // Band bucket = hash of the signature slice. Bucket equality means
    // sig-slice equality, so the hash function here is pure key
    // compression — xxhash64 longs keep the candidate self-join and
    // distinct() shuffling 8-byte keys. (The md5 above IS semantic: it
    // decides which shingle wins each min, mirrored by the oracle.)
    val bandCols = (0 until bands).map { j =>
      val slice = (0 until rowsPerBand).map(r => col(s"s${j * rowsPerBand + r}"))
      xxhash64(concat_ws("|", slice: _*)).as(s"b$j")
    }
    val allBuckets = sigs.select(col("digest") +: bandCols: _*)
      .select(col("digest"),
        posexplode(array((0 until bands).map(j => col(s"b$j")): _*)))
      .toDF("digest", "band_idx", "bucket")
    val buckets =
      if (bucketCap <= 0) allBuckets
      else {
        // representative = min doc id per distinct set: an 8-byte,
        // engine-portable, collision-free ordering for the cap
        val reps = members.groupBy("digest").agg(min("doc_id").as("rep"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "bucket").orderBy("rep")
        allBuckets.join(reps, "digest")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= bucketCap)
          .select("digest", "band_idx", "bucket")
      }

    // Size-ratio prefilter, FUSED into the candidate self-join:
    // j = |∩|/|∪| ≤ min(|A|,|B|)/max(|A|,|B|), so pairs failing the
    // ratio can never reach the threshold — provably output-neutral.
    // Each bucket row carries its set's size (a (digest, size) broadcast
    // join, 16 bytes/row), and the ratio rides the join condition as the
    // non-equi residual — ratio-failing collisions are discarded INSIDE
    // the join operator and never reach the pair-dedup shuffle
    // (measured: 2.9M surviving candidates drop to ~1.4M at sf0.1, and
    // an entire two-join prefilter stage disappears).
    //
    // A pair colliding in k bands appears k times — dedup immediately
    // after, while a candidate is still two 8-byte digests, so every
    // downstream join sees each pair once and no array payload is
    // attached yet.
    val sizes = sets.select(col("digest"), size(col("ws")).as("sz"))
    val bucketsSz = buckets.join(sizes, "digest")
    val cand = bucketsSz.as("x").join(bucketsSz.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.digest") < col("y.digest") &&
          least(col("x.sz"), col("y.sz")).cast("double")
            / greatest(col("x.sz"), col("y.sz")) >= threshold)
      .select(col("x.digest").as("g1"), col("y.digest").as("g2"))
      .distinct()
    val ratioOk = cand

    // Exact-Jaccard verify on the survivors, via the codegen'd two-pointer
    // merge (sorted_intersect_size), not the hash-building
    // array_intersect. The verify side ships each word as one xxhash64
    // LONG, not its UTF8 bytes: |∩| is invariant under a collision-free
    // identity map (≈(|A|·|B|)/2⁶⁴ collision odds per pair), so the
    // string-set oracle still matches bit-for-bit while the candidate-pair
    // joins shuffle packed 8-byte elements and the merge compares longs.
    // The word-set joins are SHUFFLE_HASH, not broadcast:
    // the distinct-set table scales with the corpus (a mandatory broadcast
    // would OOM at 100 TB), and hash beats sort-merge because neither side
    // benefits from sorted output. Arrays are attached only to ratio-
    // surviving pairs, each exactly once per side. Lazy checkpoint: the
    // frame feeds both join sides — one dedup shuffle, not two.
    val setsH = StageCache.stage(sets.select(col("digest"),
      array_sort(transform(col("ws"), w => xxhash64(w))).as("wh")))
    val sa = size(col("x.wh")); val sb = size(col("y.wh"))
    val inter = call_function("sorted_intersect_size", col("x.wh"), col("y.wh"))
    val verified = ratioOk
      .join(setsH.as("x").hint("SHUFFLE_HASH"), col("g1") === col("x.digest"))
      .join(setsH.as("y").hint("SHUFFLE_HASH"), col("g2") === col("y.digest"))
      .select(col("g1"), col("g2"),
        (inter.cast("double") / (sa + sb - inter)).as("jaccard"))
      .filter(col("jaccard") >= threshold)

    // stage the verified digest pairs too: q_dedup_minhash and
    // q_dedup_cluster run the IDENTICAL candidate+verify pipeline —
    // under the session stage cache the second consumer reads a
    // (small) pair file instead of re-running both SHUFFLE_HASH joins
    (members, if (StageCache.dir(docs).isDefined) StageCache.stage(verified)
              else verified)
  }

  /** Transitive near-duplicate clusters straight from the corpus: every
    * document labeled with its component's min doc id over the
    * [[minHashPairs]] graph — the keep/drop surface of a dedup pipeline —
    * WITHOUT ever materializing doc-level pairs.
    *
    * Scale design: connected components runs on the DIGEST graph.
    * Identical word sets share a digest and are a clique in the doc-level
    * graph, so doc-level CC pays quadratic edge expansion per digest
    * group (961k doc edges vs 45k digest edges at sf0.1 — 21×) for zero
    * extra component information. Each digest is represented by its min
    * member doc id (member sets partition the corpus, so reps are
    * distinct and the component-min over reps equals the component-min
    * over docs); CC label-propagates over rep nodes, and documents join
    * their digest's rep label back in one final digest-keyed hash join.
    */
  def dedupClusters(docs: DataFrame, idCol: String, textCol: String,
                    numHashes: Int = 16, bands: Int = 4,
                    threshold: Double = 0.9, bucketCap: Int = 0): DataFrame = {
    val (members, rawVerified) =
      minHashDigestPairs(docs, idCol, textCol, numHashes, bands, threshold, bucketCap)
    // LAZY localCheckpoint — here for PLANNING cost, not recompute: the
    // verified subtree (self-join + window cap + two SHUFFLE_HASH joins)
    // takes seconds of driver-side Catalyst analysis/codegen, and it is
    // referenced three times below (two rep joins + CC's edge input) with
    // CC re-planning its edges every round — measured as the dominant
    // cost of q_dedup_cluster at sf0.1. Truncating to a LogicalRDD makes
    // each re-plan O(1); the materialized block is one row per verified
    // distinct-set pair.
    val verified = rawVerified.localCheckpoint(eager = false)
    // lazy checkpoint: reps feeds the edge projection twice and the final
    // expansion once; one materialization, one row per distinct digest
    val reps = members.groupBy("digest").agg(min("doc_id").as("rep"))
      .localCheckpoint(eager = false)
    val edges = verified
      .join(reps.select(col("digest").as("g1"), col("rep").as("d1")), "g1")
      .join(reps.select(col("digest").as("g2"), col("rep").as("d2")), "g2")
      .select("d1", "d2")
    val labels = connectedComponents(reps.select(col("rep").as("node")), edges)
    members
      .join(reps, "digest")
      .join(labels.withColumnRenamed("node", "rep"), "rep")
      .select(col("doc_id"), col("cluster_rep"))
  }

  /** Paragraph-level dedup — boilerplate removal at sub-document
    * granularity, the form real pretraining pipelines run alongside
    * whole-document dedup: split each document on `sep`, keep only the
    * globally FIRST instance of every distinct paragraph (first = smallest
    * (doc id, position)), and reassemble each document from its surviving
    * paragraphs in order. Documents whose every paragraph was seen earlier
    * disappear from the output.
    *
    * Scale shape: paragraphs dedup on an 8-byte xxhash64 digest (the
    * shuffle never carries paragraph text for grouping), the first-instance
    * choice is a partial-agg `min(struct(id, pos))` — map-side combine
    * shrinks each mapper's contribution to one row per distinct paragraph,
    * the same no-window-sort argument as the upsert-latest query — and
    * reassembly is one aggregation keyed by doc id. No driver-side state.
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
                     sep: String = "\n\n"): DataFrame = {
    val paras = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF("doc_id", "pos", "para")
      .withColumn("digest", xxhash64(col("para")))
      // the digest fans out to the agg and the join-back below; without
      // materialization both consumers re-run split+explode from the scan
      .localCheckpoint(eager = false)
    val firsts = paras.groupBy("digest")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("digest"), col("f.doc_id").as("doc_id"), col("f.pos").as("pos"))
    paras.join(firsts, Seq("digest", "doc_id", "pos"))
      .groupBy("doc_id")
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para"))).as("text_clean"),
        count(lit(1)).as("n_kept"))
  }

  /** Digest-keyed incremental dedup verdicts — the nightly-ingest (or
    * micro-batch) decision against a standing corpus: each batch row is
    * `dup_corpus` (digest already accepted), `dup_batch` (a smaller-id row
    * of this batch has the same digest), or `keep`.
    *
    * Contract: `batch` carries (`doc_id` LONG, `h` digest); `corpusDigests`
    * carries `h` (duplicates fine — deduped here). Everything joins on the
    * digest: the corpus side shrinks to distinct digests (never documents)
    * and the first-in-batch choice is a partial-agg `min`. The same
    * function serves the batch query (q_dedup_incremental, with a
    * bloom-pruned corpus feed) and the Structured Streaming loop
    * (foreachBatch against a digest store — StreamingDedupSpec).
    */
  def incrementalVerdicts(batch: DataFrame, corpusDigests: DataFrame): DataFrame = {
    val corpus = corpusDigests.select("h").distinct().withColumn("in_corpus", lit(1))
    val firsts = batch.groupBy("h").agg(min("doc_id").as("first_id"))
    batch.join(corpus, Seq("h"), "left")
      .join(firsts, "h")
      .select(col("doc_id"), col("h").as("content_md5"),
        when(col("in_corpus").isNotNull, "dup_corpus")
          .when(col("doc_id") =!= col("first_id"), "dup_batch")
          .otherwise("keep").as("verdict"))
  }

  /** Boilerplate scrub — the frequency-threshold complement of
    * [[paragraphDedup]]: REMOVE every paragraph occurring in at least
    * `maxDocs` DISTINCT documents (navigation chrome, license headers,
    * cookie banners — content whose ubiquity marks it as boilerplate),
    * including its first occurrence, and keep everything else in place.
    * Documents left with zero paragraphs disappear (same contract as
    * [[paragraphDedup]]).
    *
    * Scale shape: the doc-frequency count groups on the 8-byte xxhash64
    * digest (partial aggs shrink each mapper to one row per distinct
    * (digest, doc)); only paragraphs OVER the threshold survive the
    * filter, so the anti-join's build side is the small boilerplate set —
    * at runtime AQE sees the post-filter size and plans a broadcast — and
    * reassembly is one aggregation per doc. No driver-side state.
    */
  def boilerplateScrub(docs: DataFrame, idCol: String, textCol: String,
                       maxDocs: Int, sep: String = "\n\n"): DataFrame = {
    require(maxDocs >= 2, "maxDocs < 2 would scrub every paragraph")
    val paras = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF("doc_id", "pos", "para")
      .withColumn("digest", xxhash64(col("para")))
      // digest fans out to the frequency agg and the anti-join below
      .localCheckpoint(eager = false)
    val boilerplate = paras.groupBy("digest")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= maxDocs)
      .select("digest")
    paras.join(boilerplate, Seq("digest"), "left_anti")
      .groupBy("doc_id")
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para"))).as("text_clean"),
        count(lit(1)).as("n_kept"))
  }

  /** Connected components over a near-duplicate pair graph — what a dedup
    * pipeline actually needs downstream of pair generation: one canonical
    * representative (min id) per transitive duplicate cluster.
    *
    * Iterative min-label propagation: each round every node adopts the
    * smallest label among itself and its neighbors; converges in
    * O(component diameter) rounds (near-dup clusters are dense, so 2-3 in
    * practice). Each round is one join + one aggregation — fully
    * distributed, no transitive-closure materialization, state is one
    * (node, label) row per node. `maxIters` is a safety bound.
    *
    * The fixpoint (min node id per component) is algorithm-independent,
    * so the DuckDB oracle may compute it with a recursive CTE and still
    * match exactly.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    // pairs feeds sym twice (forward + reversed) — LAZY localCheckpoint
    // (not persist): a cache dedups EXECUTION but leaves the logical plan
    // intact, so every round's frontier join would re-run Catalyst
    // analysis over the caller's full upstream tree (for dedupClusters,
    // the whole minhash pipeline — measured at seconds per round at
    // sf0.1). The checkpoint truncates lineage to a LogicalRDD at
    // construction, making each round's planning O(round plan) only.
    //
    // No dedup on the symmetrized edges: d1<d2 on every input pair means
    // the two directions can never collide, and duplicate input pairs are
    // merely re-delivered messages under min-label propagation (same
    // fixpoint, mild fanout) — a distinct() here would shuffle the whole
    // edge list once for zero row reduction on well-formed input. The
    // frame is REPARTITIONED on the receive key instead: every round's
    // frontier join needs ClusteredDistribution(b), so partitioning the
    // cache by b makes the per-round join reuse the cached layout and
    // shuffle only the (small) frontier, never the edges.
    //
    // FAULT-TOLERANCE TRADE-OFF (applies to every localCheckpoint in this
    // file): checkpoint blocks are NON-RECOMPUTABLE — lineage is cut, so
    // on a cluster a lost executor (failure, preemption, or
    // dynamicAllocation reclaiming an idle executor that holds blocks)
    // fails the job instead of recomputing the partition. That is the
    // price of killing the measured per-round Catalyst re-planning cost.
    // On a real cluster either run the dedup family with
    // spark.dynamicAllocation.enabled=false (or
    // spark.dynamicAllocation.cachedExecutorIdleTimeout=infinity), or
    // swap localCheckpoint for reliable checkpoint(dir) and pay the
    // HDFS/object-store write. SCALING.md §dedup records the same note.
    val p = pairs.localCheckpoint(eager = false)
    val edges = p.select(col("d1").as("a"), col("d2").as("b"))
    val sym = edges.unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b")).cache()
    // localCheckpoint (NOT cache) each round: the label frame references
    // itself twice per iteration, so without lineage truncation the
    // logical plan doubles every round and analysis time grows
    // exponentially — the classic iterative-dataflow trap. Checkpointing
    // keeps the plan constant-size and stays fully distributed.
    //
    // Frontier propagation: a node's label can only drop when a NEIGHBOR'S
    // label dropped the round before, so each round joins the edge list
    // against only the nodes that changed last round, not the full label
    // frame. Same fixpoint — every improvement path starts at an initial
    // label, and every improvement re-enters the frontier — but late
    // rounds touch a vanishing fraction of the graph.
    //
    // Two accelerations on top (both preserve the fixpoint):
    //   - Round 1 needs no join at all: the frontier is every node and
    //     every label is the node id, so the incoming minimum is just
    //     min(neighbor id) — a plain partial-aggregated groupBy over the
    //     edge list.
    //   - POINTER JUMPING each later round: label'(v) = label(label(v)),
    //     read from the PREVIOUS round's checkpoint (a materialized scan,
    //     so unlike the measured-slower wave-fused 2-hop variant nothing
    //     recomputes). Labels are always node ids, labels only decrease,
    //     and label(label(v)) stays in v's component — so chains compress
    //     geometrically and long-diameter tails converge in O(log d)
    //     rounds instead of O(d). Jump improvements are read from the
    //     full label frame (not the frontier), so they cannot be missed
    //     by frontier pruning; an empty frontier still implies a
    //     stationary round and thus the true fixpoint.
    val tInit = System.nanoTime()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    if (sys.props.contains("graft.cc.profile"))
      println(f"[cc] init labels ckpt: ${(System.nanoTime() - tInit) / 1e9}%.2f s")
    var frontierSize = 0L
    var frontier: DataFrame = null
    var i = 0
    var converged = false
    while (!converged && i < maxIters) {
      val best =
        if (i == 0) sym.groupBy(col("b").as("node")).agg(min("a").as("cand"))
        else sym.join(frontier.withColumnRenamed("node", "b"), Seq("b"))
          .select(col("a").as("node"), col("label"))
          .groupBy("node").agg(min("label").as("cand"))
      // pointer jump ×2: label(label(label(v))) — three self-joins of the
      // MATERIALIZED label checkpoint (labels are node ids, so a label is
      // always itself a node with a row), compressing chains ~3× per
      // round for the cost of small hash joins, no recompute
      def jumpOnce(in: DataFrame, from: String, to: String): DataFrame =
        in.join(labels.select(col("node").as(from), col("label").as(to)),
            Seq(from), "left")
          .withColumn(to, coalesce(col(to), col(from)))
      val jumped =
        if (i == 0) labels.select(col("node"), col("label"), col("label").as("jl"))
        else jumpOnce(jumpOnce(
            labels.select(col("node"), col("label"), col("label").as("j1")),
            "j1", "j2"), "j2", "jl")
          .select(col("node"), col("label"), col("jl"))
      // LAZY checkpoint: the frontier count below is the round's single
      // action — it materializes the checkpoint and sizes the next
      // frontier in one job instead of two.
      val rPlan = System.nanoTime()
      val merged = jumped.join(best, Seq("node"), "left")
        .select(col("node"),
          least(col("jl"), coalesce(col("cand"), col("jl"))).as("label"),
          (least(col("jl"), coalesce(col("cand"), col("jl")))
            < col("label")).as("improved"))
        .localCheckpoint(eager = false)
      if (sys.props.contains("graft.cc.profile"))
        println(f"[cc] round ${i + 1} plan+ckpt-wrap: ${(System.nanoTime() - rPlan) / 1e9}%.2f s")
      frontier = merged.filter(col("improved")).select("node", "label")
      val r0 = System.nanoTime()
      frontierSize = frontier.count()
      if (sys.props.contains("graft.cc.profile"))
        println(f"[cc] round ${i + 1}: frontier=$frontierSize ${(System.nanoTime() - r0) / 1e9}%.2f s")
      // The count above materialized THIS round's checkpoint, and it was
      // the last reader of the previous round's blocks (this round's
      // jumped/best/merged all derive from the new checkpoint from here
      // on) — release them so resident label storage stays O(1) frames
      // instead of O(rounds).
      releaseCheckpointBlocks(labels)
      labels = merged.select("node", "label")
      converged = frontierSize == 0
      i += 1
    }
    if (frontierSize > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did not converge in $maxIters iterations " +
          s"($frontierSize labels still changing) — returned labels are NOT " +
          "a fixpoint; raise maxIters for graphs of larger diameter")
    // labels is checkpoint-materialized (lineage-free), so neither the
    // edge cache nor p's checkpoint blocks are referenced by the returned
    // frame — release both eagerly. Waiting for the context cleaner (a
    // GC-driven path) lets blocks from every call accumulate in a
    // long-lived session, where storage steals from execution in the
    // unified memory manager.
    sym.unpersist()
    releaseCheckpointBlocks(p)
    labels.withColumnRenamed("label", "cluster_rep")
  }

  /** Eagerly drop the storage blocks behind a lazily
    * `localCheckpoint(eager = false)`-ed frame. `Dataset.unpersist` only
    * reaches `CacheManager` entries (`.cache()`/`.persist()`); a local
    * checkpoint persists its RDD directly, so the block release has to go
    * through the `LogicalRDD` the checkpoint planted in the logical plan.
    * Safe to call only once no downstream consumer will scan the frame
    * again — the blocks are non-recomputable. */
  private def releaseCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** 64-bit SimHash per document from xxhash64 word hashes: bit i of the
    * fingerprint is the sign of Σ±1 votes over that bit across words.
    *
    * The ±1 votes are equivalent to one-counts: bit i is set iff
    * 2·ones(i) > n_words. The 64 per-bit one-counts are accumulated as 16
    * lane-packed longs — `(h >>> k) & 0x0001000100010001` drops bits
    * k, k+16, k+32, k+48 into four independent 16-bit lanes, so one SUM
    * aggregates four counters with no cross-lane carries for up to 65535
    * distinct words per document (far beyond any real document's distinct
    * vocabulary; lane width is the only capacity assumption). 16+1
    * aggregate expressions instead of 64 keeps the hash-aggregate codegen
    * small and ~4× cheaper. */
  def simHash64(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simHashFp(docs, idCol, textCol, w => xxhash64(w), 64)

  /** md5-derived 60-bit SimHash (15 hex chars → BIGINT): ~half the hash
    * throughput of [[simHash64]] but SQL-portable, so a DuckDB oracle can
    * mirror the ENTIRE pipeline bit-for-bit (`('0x' || substring(md5(w),
    * 1, 15))::BIGINT` ≡ Spark `conv(substring(md5(w),1,15),16,10)`). */
  def simHash60Md5(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simHashFp(docs, idCol, textCol,
      w => conv(substring(md5(w.cast("binary")), 1, 15), 16, 10).cast("long"), 60,
      hashPerVocab = true)

  /** @param hashPerVocab compute the word hash once per DISTINCT word and
    *        join back (worth it for expensive hashes like md5-hex→int;
    *        pointless for xxhash64, which is cheaper than the join) */
  private def simHashFp(docs: DataFrame, idCol: String, textCol: String,
                        wordHash: Column => Column, nBits: Int,
                        hashPerVocab: Boolean = false): DataFrame = {
    val bare = docs.select(col(idCol).as("doc_id"),
      explode(wordSet(col(textCol))).as("word"))
    val words =
      if (hashPerVocab)
        bare.join(bare.select("word").distinct()
          .select(col("word"), wordHash(col("word")).as("h")), "word")
      else bare.withColumn("h", wordHash(col("word")))
    val h = col("h")
    val laneMask = 0x0001000100010001L
    val packExprs = (0 until 16).map(k =>
      sum(shiftrightunsigned(h, k).bitwiseAND(laneMask)).as(s"p$k"))
    val aggs = packExprs :+ count(lit(1)).as("n_words")
    val packed = words.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val fp = (0 until nBits).map { i =>
      val ones = shiftrightunsigned(col(s"p${i % 16}"), (i / 16) * 16)
        .bitwiseAND(0xFFFFL)
      when(ones * 2 > col("n_words"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    packed.select(col("doc_id"), fp.as("simhash"))
  }

  /** Near-dup pairs by hamming distance over [[simHash64]] fingerprints,
    * with 4×16-bit banded candidate generation. A pair is a candidate iff
    * it agrees EXACTLY on ≥1 band; by pigeonhole that is guaranteed only
    * for hamming ≤ 3 (4 differing bits can land in 4 distinct bands).
    * For 3 < hamming ≤ maxHamming recall is probabilistic — high when the
    * differing bits cluster, zero when they spread across all four bands
    * — the standard LSH recall/cost trade. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 10): DataFrame =
    bandedHammingPairs(simHash64(docs, idCol, textCol), 4, 16, maxHamming)

  /** [[simHashPairs]] over the md5-based 60-bit fingerprint (4×15-bit
    * bands) — the oracle-checkable twin; pigeonhole guarantee likewise
    * hamming ≤ 3. */
  def simHashPairsMd5(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 10): DataFrame =
    bandedHammingPairs(simHash60Md5(docs, idCol, textCol), 4, 15, maxHamming)

  private def bandedHammingPairs(fp: DataFrame, bands: Int, bandBits: Int,
                                 maxHamming: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    // staged fingerprint frame (lazy checkpoint when the session cache
    // is off): the banded frame self-joins below; without it the
    // fingerprint aggregation runs once per join side (see
    // minHashPairs) — and under the session stage cache the md5
    // fingerprints are shared between q_dedup_simhash's calibration
    // and the q_dedup_simhash_md5 twin
    val banded = StageCache.stage(fp)
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until bands).map(j =>
          shiftrightunsigned(col("simhash"), j * bandBits).bitwiseAND(mask)): _*)))
      .toDF("doc_id", "simhash", "band_idx", "band_val")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.simhash").as("h1"), col("y.simhash").as("h2"))
      .distinct()
    val pairs = cand
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    // stage the (small) verified pair frame too: q_dedup_simhash
    // consumes BOTH hash families' pairs for its calibration, and the
    // md5 side is exactly the q_dedup_simhash_md5 pipeline
    if (StageCache.dir(fp).isDefined) StageCache.stage(pairs) else pairs
  }
}
