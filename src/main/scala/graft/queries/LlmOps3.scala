package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Similarity
import graft.ops.{Dedup, RuntimeFilters, TextAnalysis}

/** Round-3 training-data-pipeline additions: sub-document (paragraph)
  * deduplication and Gopher-style repetition quality gates.
  *
  * The synthetic corpus is a flat word stream (no '\n\n'), so queries
  * that need paragraph structure derive it deterministically — every
  * 12-word chunk is one paragraph — with the identical construction in
  * the DuckDB oracle (Spark `slice` ≡ DuckDB `list_slice`, both
  * clamping), keeping the compare hash-exact while the OPERATOR stays
  * true to real use (split on a separator).
  */
object LlmOps3 {

  private val paraWords = 12

  /** Spark column: text re-chunked into '\n\n'-separated 12-word
    * paragraphs. */
  private def chunked(textCol: String) = {
    val ws = split(col(textCol), " ")
    val nChunks = ceil(size(ws) / lit(paraWords.toDouble)).cast("int")
    concat_ws("\n\n", transform(sequence(lit(0), nChunks - 1),
      j => concat_ws(" ", slice(ws, j * paraWords + 1, lit(paraWords)))))
  }

  /** DuckDB CTE fragment producing (doc_id, pos, para) for the same
    * chunking. */
  private val paraCtes =
    s"""ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
px AS (SELECT doc_id, w, unnest(range(0, ceil(len(w)/$paraWords.0)::BIGINT)) AS pos FROM ws),
para AS (SELECT doc_id, pos,
           array_to_string(list_slice(w, pos*$paraWords+1, pos*$paraWords+$paraWords), ' ') AS para
         FROM px)"""

  val defs: Seq[QueryDef] = Seq(

    // Paragraph-level dedup — boilerplate removal: keep the globally
    // first instance of each distinct paragraph, reassemble docs from the
    // survivors. The 31-word synthetic vocabulary makes cross-document
    // chunk collisions common, so the dedup genuinely bites.
    QueryDef("q_dedup_paragraph",
      (s, d) => {
        val paraDocs = Tables.documents(s, d)
          .select(col("doc_id"), chunked("text").as("text"))
        Dedup.paragraphDedup(paraDocs, "doc_id", "text").orderBy("doc_id")
      },
      s"""WITH $paraCtes,
ranked AS (SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn FROM para),
kept AS (SELECT doc_id, pos, para FROM ranked WHERE rn = 1)
SELECT doc_id, string_agg(para, e'\\n\\n' ORDER BY pos) AS text_clean,
  count(*)::BIGINT AS n_kept
FROM kept GROUP BY doc_id ORDER BY doc_id"""),

    // Frequency-threshold boilerplate scrub — the complement of
    // q_dedup_paragraph: paragraphs appearing in >= 2 distinct docs are
    // removed EVERYWHERE (first copy included), the CCNet-style "drop
    // ubiquitous lines" pass. Doc-frequency counts group on 8-byte
    // digests; the anti-join's build side is only the over-threshold set.
    QueryDef("q_scrub_boilerplate",
      (s, d) => {
        val paraDocs = Tables.documents(s, d)
          .select(col("doc_id"), chunked("text").as("text"))
        Dedup.boilerplateScrub(paraDocs, "doc_id", "text", maxDocs = 2)
          .orderBy("doc_id")
      },
      s"""WITH $paraCtes,
freq AS (SELECT para, count(DISTINCT doc_id) AS nd FROM para GROUP BY para),
kept AS (SELECT doc_id, pos, para FROM para JOIN freq USING (para) WHERE nd < 2)
SELECT doc_id, string_agg(para, e'\\n\\n' ORDER BY pos) AS text_clean,
  count(*)::BIGINT AS n_kept
FROM kept GROUP BY doc_id ORDER BY doc_id"""),

    // ExactSubstr-style repeated-span detection (Lee et al.,
    // "Deduplicating Training Data Makes Language Models Better"): slide
    // an 8-token window at stride 1 over every document and flag spans
    // whose exact text recurs in ANOTHER document — the diagnostic that
    // drives substring-level dedup. Per doc: window count, positions
    // covered by a cross-doc span, and the repeated fraction.
    //
    // Scale shape: windows group/join on 8-byte xxhash64 digests, never
    // the window text (the oracle groups the raw strings — counts agree
    // absent 64-bit collisions, ≈1e-12 per corpus here); the cross-doc
    // set survives a >= 2 distinct-doc filter so the semi join's build
    // side is small; per-doc rollup is one partial-agg groupBy.
    QueryDef("q_dedup_substring",
      (s, d) => {
        val W = 8
        graft.functions.SlidingWindows.register(s)
        // native Generator (r16): the posexplode∘transform∘sequence∘slice
        // composition materialized the full n·W-token window array per
        // row before exploding; sliding_windows streams the same windows
        // (byte-identical content — the gate re-proves the hashes)
        val ws = split(col("text"), " ")
        val rows = Tables.documents(s, d)
          .select(col("doc_id"),
            call_function("sliding_windows", ws, lit(W), lit(1), lit(false)))
          .toDF("doc_id", "pos", "win")
          .select(col("doc_id"), col("pos"), xxhash64(col("win")).as("dig"))
          .localCheckpoint(eager = false) // fans out to the count + the semi join
        val crossDoc = rows.groupBy("dig")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("dig")
        val flagged = rows.join(crossDoc, Seq("dig"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_repeated"))
        rows.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
          .join(flagged, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_windows"),
            coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
            (coalesce(col("n_repeated"), lit(0L)).cast("double")
              / col("n_windows")).as("repeated_frac"))
          .orderBy("doc_id")
      },
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         wn AS (SELECT doc_id, unnest(range(1, len(w) - 8 + 2)) AS pos, w
                FROM ws WHERE len(w) >= 8),
         win AS (SELECT doc_id, pos,
                   array_to_string(list_slice(w, pos, pos + 7), ' ') AS win
                 FROM wn),
         cross_doc AS (SELECT win FROM win GROUP BY win
                       HAVING count(DISTINCT doc_id) >= 2),
         rep AS (SELECT doc_id, count(*) AS n_repeated
                 FROM win WHERE win IN (SELECT win FROM cross_doc)
                 GROUP BY doc_id)
         SELECT w.doc_id, count(*)::BIGINT AS n_windows,
           coalesce(any_value(r.n_repeated), 0)::BIGINT AS n_repeated,
           coalesce(any_value(r.n_repeated), 0)::DOUBLE / count(*) AS repeated_frac
         FROM win w LEFT JOIN rep r ON w.doc_id = r.doc_id
         GROUP BY w.doc_id ORDER BY w.doc_id"""),

    // Maximal repeated-span EXTENTS — the actual ExactSubstr output shape
    // (Lee et al. §4.1: the dedup pass needs [start, end) ranges it can
    // CUT, not per-doc scores): merge each doc's flagged stride-1 windows
    // into maximal word-index spans wherever their 8-word coverage
    // overlaps or touches. Classic gaps-and-islands: a window opens a new
    // span iff its position lies beyond every earlier window's covered
    // end (running max over a sorted per-doc frame), then span id = the
    // running count of opens, then one groupBy rolls each island up to
    // (span_start, span_end, n_windows).
    //
    // Scale shape: identical digest-keyed pipeline as q_dedup_substring
    // (the shuffle carries (doc_id, pos, 8-byte digest), never window
    // text); the islands pass adds ONE extra shuffle — the sort by
    // (doc_id, pos) that both window functions and the rollup share —
    // over only the flagged subset, which the >=2-distinct-docs filter
    // has already cut to the cross-doc sliver of the corpus.
    QueryDef("q_dedup_substring_spans",
      (s, d) => {
        val W = 8
        graft.functions.SlidingWindows.register(s)
        val ws = split(col("text"), " ")
        val rows = Tables.documents(s, d)
          .select(col("doc_id"),
            // the q_dedup_substring generator (r16) — same windows, no
            // all-windows intermediate array
            call_function("sliding_windows", ws, lit(W), lit(1), lit(false)))
          .toDF("doc_id", "pos", "win")
          // generator pos is 0-based; word positions (and the oracle's
          // range()) are 1-based
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
            xxhash64(col("win")).as("dig"))
          .localCheckpoint(eager = false) // fans out to count + semi join
        val crossDoc = rows.groupBy("dig")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("dig")
        val flagged = rows.join(crossDoc, Seq("dig"), "left_semi")
        val byPos = Window.partitionBy("doc_id").orderBy("pos")
        val coveredSoFar = byPos.rowsBetween(Window.unboundedPreceding, -1)
        flagged
          .withColumn("brk",
            when(col("pos") > coalesce(
              max(col("pos") + W).over(coveredSoFar), lit(-1L)), 1).otherwise(0))
          .withColumn("island", sum(col("brk")).over(byPos))
          .groupBy(col("doc_id"), col("island"))
          .agg(min("pos").as("span_start"),
            (max(col("pos")) + W).as("span_end"),
            count(lit(1)).as("n_windows"))
          .select("doc_id", "span_start", "span_end", "n_windows")
          .orderBy("doc_id", "span_start")
      },
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         wn AS (SELECT doc_id, unnest(range(1, len(w) - 8 + 2)) AS pos, w
                FROM ws WHERE len(w) >= 8),
         win AS (SELECT doc_id, pos,
                   array_to_string(list_slice(w, pos, pos + 7), ' ') AS win
                 FROM wn),
         cross_doc AS (SELECT win FROM win GROUP BY win
                       HAVING count(DISTINCT doc_id) >= 2),
         flagged AS (SELECT doc_id, pos FROM win
                     WHERE win IN (SELECT win FROM cross_doc)),
         g AS (SELECT doc_id, pos,
                 CASE WHEN pos > coalesce(max(pos + 8) OVER (
                     PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                   THEN 1 ELSE 0 END AS brk
               FROM flagged),
         i AS (SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM g)
         SELECT doc_id, min(pos)::BIGINT AS span_start,
           (max(pos) + 8)::BIGINT AS span_end, count(*)::BIGINT AS n_windows
         FROM i GROUP BY doc_id, island ORDER BY doc_id, span_start"""),

    // Gopher-style repetition/quality gates, one row per doc: duplicate
    // word fraction, duplicate paragraph fraction (the "duplicate line
    // fraction" analogue over the derived chunks), most-frequent-bigram
    // share, and symbol-to-word ratio. Per-DOCUMENT metrics need no
    // explode and no shuffle at all: everything is an array expression in
    // ONE narrow codegen'd projection (the bigram mode via
    // distinct→filter-count, O(d·n) per row on short docs) — the shape
    // that scans 100 TB exactly once with zero cross-node traffic.
    QueryDef("q_text_repetition",
      (s, d) => {
        val ws = split(col("text"), " ")
        val nChunks = ceil(size(ws) / lit(paraWords.toDouble)).cast("int")
        val paras = transform(sequence(lit(0), nChunks - 1),
          j => concat_ws(" ", slice(ws, j * paraWords + 1, lit(paraWords))))
        val bg = TextAnalysis.bigrams(ws, " ")
        // inline() barrier: ws/paras/bg are each referenced several times
        // below and CollapseProject would clone the construction per use
        // documentsBalanced (r17): the per-row mode computation is
        // O(|bg|·|distinct bg|) and ran single-threaded in the
        // one-row-group scan stage
        val staged = Tables.documentsBalanced(s, d).select(col("doc_id"), col("text"),
          inline(array(struct(ws.as("ws"), paras.as("paras"), bg.as("bg")))))
        val mode = array_max(transform(array_distinct(col("bg")),
          x => size(filter(col("bg"), y => y === x))))
        staged.select(col("doc_id"),
            (lit(1.0) - size(array_distinct(col("ws"))).cast("double")
              / size(col("ws"))).as("dup_word_frac"),
            (lit(1.0) - size(array_distinct(col("paras"))).cast("double")
              / size(col("paras"))).as("dup_para_frac"),
            (mode.cast("double") / size(col("bg"))).as("top_bigram_share"),
            (length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast("double")
              / size(col("ws"))).as("symbol_word_ratio"))
          .orderBy("doc_id")
      },
      s"""WITH st AS (SELECT doc_id, text, string_split(text, ' ') AS w,
         list_transform(range(0, (len(string_split(text, ' ')) + ${paraWords - 1}) // $paraWords),
           j -> array_to_string(list_slice(string_split(text, ' '),
             j*$paraWords + 1, j*$paraWords + $paraWords), ' ')) AS paras,
         list_transform(range(1, len(string_split(text, ' '))),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]) AS bg
       FROM documents)
SELECT doc_id,
  1.0 - (len(list_distinct(w))::DOUBLE / len(w)) AS dup_word_frac,
  1.0 - (len(list_distinct(paras))::DOUBLE / len(paras)) AS dup_para_frac,
  list_max(list_transform(list_distinct(bg),
    x -> len(list_filter(bg, y -> y = x))))::DOUBLE / len(bg) AS top_bigram_share,
  length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / len(w) AS symbol_word_ratio
FROM st ORDER BY doc_id"""),

    // Corpus-wide n-gram vocabulary statistics — the counting pass behind
    // tokenizer training and frequency-based filtering: top 50 bigrams by
    // total occurrences with their document frequencies. Shape: explode,
    // one partially-aggregated groupBy on the bigram (count + distinct
    // doc via Catalyst's expand), global top-k as TakeOrdered — the
    // shuffle carries (bigram, counts), never documents.
    QueryDef("q_vocab_ngrams",
      (s, d) => {
        val ws = split(col("text"), " ")
        val bigrams = TextAnalysis.bigrams(ws, " ")
        Tables.documents(s, d)
          .select(col("doc_id"), explode(bigrams).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n_total"),
            countDistinct("doc_id").as("n_docs"))
          .orderBy(col("n_total").desc, col("bigram").asc)
          .limit(50)
      },
      """WITH bg AS (
           SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
           FROM documents)
         SELECT bigram, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
         FROM bg GROUP BY bigram
         ORDER BY n_total DESC, bigram ASC LIMIT 50"""),

    // Sliding token-window chunking (size 32, stride 24 → 8-token
    // overlap) — how documents become embedding-model inputs: every
    // window starts at k·stride, the last window begins before the text
    // runs out, short docs yield exactly one chunk. Integer window-count
    // arithmetic is mirrored exactly; slices clamp identically.
    QueryDef("q_text_chunks",
      (s, d) => {
        val size32 = 32; val stride = 24
        graft.functions.SlidingWindows.register(s)
        // native Generator (r16), partial = true: same window count
        // (1 + ceil(max(n-32,0)/24)) and clamped last chunk as the old
        // posexplode∘transform composition, without materializing every
        // chunk in one array cell first
        val ws = split(col("text"), " ")
        Tables.documents(s, d)
          .select(col("doc_id"),
            call_function("sliding_windows", ws, lit(size32), lit(stride),
              lit(true)))
          .toDF("doc_id", "chunk_idx", "chunk_text")
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            col("chunk_text"),
            size(split(col("chunk_text"), " ")).cast("long").as("n_tokens"))
          .orderBy("doc_id", "chunk_idx")
      },
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         nw AS (SELECT doc_id, w,
                  1 + (greatest(len(w) - 32, 0) + 23) // 24 AS n_wins FROM ws),
         ch AS (SELECT doc_id, w, unnest(range(0, n_wins)) AS k FROM nw)
         SELECT doc_id, k::BIGINT AS chunk_idx,
           array_to_string(list_slice(w, k*24 + 1, k*24 + 32), ' ') AS chunk_text,
           len(list_slice(w, k*24 + 1, k*24 + 32))::BIGINT AS n_tokens
         FROM ch ORDER BY doc_id, chunk_idx"""),

    // Incremental-ingest dedup — the nightly-batch shape: 20% of docs
    // (doc_id % 10 < 2, SF-stable) arrive as the NEW batch and each gets
    // a verdict against the standing corpus: exact-content dup of the
    // corpus, dup within the batch (a smaller-id batch doc has the same
    // content), or keep. Digest-keyed joins only — the corpus side
    // shrinks to distinct 16-byte digests, never documents; verdicts are
    // a left join + a partial-agg min per digest.
    //
    // The standing-corpus side is bloom-pruned by the batch's digests
    // BEFORE its distinct() shuffle: at the real 100 TB asymmetry
    // (standing corpus ≫ nightly batch) the corpus-side shuffle is the
    // whole cost of this query, and a batch-keyed sketch deletes all of
    // it except true matches + ~3% false positives. No false negatives,
    // and pruned rows would have null-extended out of the left join
    // anyway, so the result is provably unchanged (oracle hash agrees).
    QueryDef("q_dedup_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        val isNew = col("doc_id") % 10 < 2
        val batch = docs.filter(isNew)
        val corpus = RuntimeFilters
          .bloomPruned(docs.filter(!isNew), col("h"), batch, col("h"),
            expectedItems = 100000L)
          .select("h")
        Dedup.incrementalVerdicts(batch, corpus).orderBy("doc_id")
      },
      """WITH docs AS (SELECT doc_id, md5(text) AS h FROM documents),
         corpus AS (SELECT DISTINCT h FROM docs WHERE doc_id % 10 >= 2),
         batch AS (SELECT doc_id, h FROM docs WHERE doc_id % 10 < 2),
         firsts AS (SELECT h, min(doc_id) AS first_id FROM batch GROUP BY h)
         SELECT b.doc_id, b.h AS content_md5,
           CASE WHEN b.h IN (SELECT h FROM corpus) THEN 'dup_corpus'
                WHEN b.doc_id <> f.first_id THEN 'dup_batch'
                ELSE 'keep' END AS verdict
         FROM batch b JOIN firsts f USING (h)
         ORDER BY b.doc_id"""),

    // Multi-TABLE LSH ANN — the third member of the recall ladder
    // (single bucket → multi-probe → multi-table): L=4 independent hash
    // tables, each sign-hashing a DIFFERENT 4-dim slice of the vector, so
    // a near neighbor is a candidate if it co-buckets in ANY table —
    // tables fail independently and recall compounds as 1-(1-r)^L.
    // Candidate pairs dedup BEFORE the cosine kernel (each pair scored
    // once no matter how many tables it collided in); the probe side
    // rides a broadcast, the corpus scans once per table via explode.
    QueryDef("q_similarity_ann_multitable",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val nTables = 4
        val e0 = Tables.embeddings(s, d)
        val tabBuckets = array((0 until nTables).map(t =>
          Similarity.signBucketAt(col("embedding"), 4, t * 4)): _*)
        val e = e0.select(col("vec_id"), posexplode(tabBuckets))
          .toDF("vec_id", "tbl", "bucket")
        val q = e0.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), posexplode(tabBuckets))
          .toDF("q_id", "q_tbl", "q_bucket")
        val cand = e.join(broadcast(q),
            col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket") &&
              col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id")).distinct()
        val w = Window.partitionBy("q_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
        cand
          .join(e0.select(col("vec_id").as("neighbor_id"), col("embedding")),
            "neighbor_id")
          .join(broadcast(e0.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))), "q_id")
          .select(col("q_id"), col("neighbor_id"),
            call_function("cosine_sim", col("embedding"), col("q_emb")).as("cosine_sim"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("q_id", "rn", "neighbor_id", "cosine_sim")
          .orderBy("q_id", "rn")
      },
      s"""WITH tab AS (${(0 until 4).map(t =>
             s"SELECT vec_id, $t AS tbl, ${Similarity.signBucketAtSql("embedding", 4, t * 4)}::BIGINT AS bucket FROM embeddings")
           .mkString(" UNION ALL ")}),
         q AS (SELECT vec_id AS q_id, tbl AS q_tbl, bucket AS q_bucket FROM tab WHERE vec_id < 5),
         cand AS (SELECT DISTINCT q_id, e.vec_id AS neighbor_id
                  FROM tab e JOIN q ON e.tbl = q.q_tbl AND e.bucket = q.q_bucket
                    AND e.vec_id <> q.q_id),
         sc AS (SELECT q_id, neighbor_id,
                  ${Similarity.cosineSql("n.embedding", "qe.embedding")} AS cosine_sim
                FROM cand JOIN embeddings n ON neighbor_id = n.vec_id
                  JOIN embeddings qe ON q_id = qe.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM sc)
         SELECT q_id, rn, neighbor_id, cosine_sim FROM r WHERE rn <= 3
         ORDER BY q_id, rn"""),

    // Per-key skew diagnostic — the operational pass you run BEFORE
    // choosing salting/AQE-skew settings on a 100 TB join: top-20 heavy
    // hitter users by event count, each with its share of total traffic
    // and the running cumulative share. One partial-agg groupBy, a
    // single-row broadcast total, and a 20-row window — nothing scans
    // twice, nothing collects.
    QueryDef("q_events_heavyhitters",
      (s, d) => {
        val counts = Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        // Σ per-user counts == plain count(*): the single-row total comes
        // from a shuffle-free count-star scan instead of re-running the
        // per-user aggregation a second time (exchange reuse does not
        // cover the post-agg sum — verified in the plan)
        val total = Tables.events(s, d).agg(count(lit(1)).as("total"))
        val w = Window.orderBy(col("n_events").desc, col("user_id").asc)
        counts
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 20)
          .crossJoin(broadcast(total))
          .withColumn("share", col("n_events").cast("double") / col("total"))
          .withColumn("cum_share",
            sum(col("n_events")).over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double") / col("total"))
          .select("rnk", "user_id", "n_events", "share", "cum_share")
          .orderBy("rnk")
      },
      """WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
         t AS (SELECT count(*)::BIGINT AS total FROM events),
         r AS (SELECT user_id, n_events,
                 row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS rnk,
                 sum(n_events) OVER (ORDER BY n_events DESC, user_id ASC
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM c)
         SELECT rnk, user_id, n_events,
           n_events::DOUBLE / total AS share,
           cum::DOUBLE / total AS cum_share
         FROM r, t WHERE rnk <= 20 ORDER BY rnk"""),

    // Token-count histogram — corpus observability: distribution of doc
    // lengths in buckets of 10 tokens. One partial-agg groupBy over a
    // derived bucket key; the pass every pipeline runs before choosing
    // chunk sizes and packing budgets.
    QueryDef("q_text_histogram",
      (s, d) => {
        val n = size(split(col("text"), " "))
        Tables.documents(s, d)
          .select((floor(n / 10) * 10).cast("long").as("bucket_lo"))
          .groupBy("bucket_lo")
          .agg(count(lit(1)).as("n_docs"))
          .select(col("bucket_lo"), (col("bucket_lo") + 9).as("bucket_hi"),
            col("n_docs"))
          .orderBy("bucket_lo")
      },
      """SELECT (len(string_split(text, ' ')) // 10 * 10)::BIGINT AS bucket_lo,
           (len(string_split(text, ' ')) // 10 * 10 + 9)::BIGINT AS bucket_hi,
           count(*) AS n_docs
         FROM documents GROUP BY 1, 2 ORDER BY bucket_lo"""),

    // Truncation-duplicate detection — the "same doc, cut short" dup
    // class exact dedup misses and Jaccard under-scores: a doc whose full
    // text is a STRICT prefix of another doc's text. Candidates bucket on
    // an md5 of the first 8 tokens (prefix pairs MUST share it), verify
    // with starts_with, and each truncated doc reports the smallest
    // superseding doc id. Bounded like all the LSH ops: Σbucket², never
    // N². Docs shorter than the 8-token key are excluded by contract
    // (their prefix relation can't share the bucket key; the exact-dedup
    // path owns sub-key-length docs) — the oracle applies the same bound.
    QueryDef("q_dedup_prefix",
      (s, d) => {
        val ws = split(col("text"), " ")
        val docs = Tables.documents(s, d)
          .filter(size(ws) >= 8)
          .select(col("doc_id"), col("text"),
            md5(concat_ws(" ", slice(ws, 1, 8)).cast("binary")).as("pk"))
          .localCheckpoint(eager = false)
        docs.as("a").join(docs.as("b"), Seq("pk"))
          .filter(col("a.doc_id") =!= col("b.doc_id") &&
            length(col("b.text")) > length(col("a.text")) &&
            col("b.text").startsWith(concat(col("a.text"), lit(" "))))
          .groupBy(col("a.doc_id").as("truncated_id"))
          .agg(min(col("b.doc_id")).as("superseded_by"),
            count(lit(1)).as("n_supersets"))
          .orderBy("truncated_id")
      },
      """WITH d AS (SELECT doc_id, text,
             md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')) AS pk
           FROM documents WHERE len(string_split(text, ' ')) >= 8)
         SELECT a.doc_id AS truncated_id, min(b.doc_id) AS superseded_by,
           count(*) AS n_supersets
         FROM d a JOIN d b ON a.pk = b.pk AND a.doc_id <> b.doc_id
           AND length(b.text) > length(a.text)
           AND starts_with(b.text, a.text || ' ')
         GROUP BY a.doc_id ORDER BY truncated_id"""),

    // Per-group QUANTILE-threshold filtering — adaptive curation: each
    // language keeps its docs at/above its own 25th percentile of token
    // count (fixed thresholds — q_curation_pipeline — misbehave across
    // heterogeneous languages/domains). Thresholds are one tiny
    // per-group aggregate broadcast back over the corpus; Spark
    // `percentile` is bit-equal to DuckDB `quantile_cont` (verified
    // corpus-wide in round 1).
    QueryDef("q_quality_quantile_filter",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
          .localCheckpoint(eager = false)  // feeds thresholds AND the filter pass
        val th = toks.groupBy("lang")
          .agg(expr("percentile(n_tok, 0.25)").as("p25"),
            count(lit(1)).as("n_total"))
        val kept = toks.join(broadcast(th.select("lang", "p25")), "lang")
          .filter(col("n_tok") >= col("p25"))
          .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        th.join(kept, "lang")
          .select("lang", "p25", "n_total", "n_kept")
          .orderBy("lang")
      },
      """WITH t AS (SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
         th AS (SELECT lang, quantile_cont(n_tok, 0.25) AS p25, count(*) AS n_total
                FROM t GROUP BY lang),
         k AS (SELECT t.lang, count(*) AS n_kept FROM t JOIN th USING (lang)
               WHERE n_tok >= p25 GROUP BY t.lang)
         SELECT lang, p25, n_total, n_kept FROM th JOIN k USING (lang)
         ORDER BY lang"""),

    // CDC MERGE — a correction batch applied to the orders snapshot:
    // every 7th order gets a whole-row status correction, every 13th
    // spawns an insert (negated key). One full-outer shuffle join on the
    // key; updates replace matched rows entirely, unmatched updates
    // insert, unmatched base rows pass through.
    QueryDef("q_merge_upsert",
      (s, d) => {
        val base = Tables.orders(s, d)
          .select("o_orderkey", "o_orderstatus", "o_custkey")
        val corrections = base.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
            lit(-1L).as("o_custkey"))
        // key 0 is excluded: -0 == 0 would collide with key 0's own
        // correction and break the unique-update-keys contract
        val inserts = base.filter(col("o_orderkey") % 13 === 0 &&
            col("o_orderkey") =!= 0)
          .select((-col("o_orderkey")).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(-2L).as("o_custkey"))
        graft.ops.Merge.upsert(base, corrections.unionAll(inserts),
            Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      """WITH b AS (SELECT o_orderkey, o_orderstatus, o_custkey FROM orders),
         u AS (SELECT o_orderkey, 'X' AS o_orderstatus, -1::BIGINT AS o_custkey
                 FROM b WHERE o_orderkey % 7 = 0
               UNION ALL
               SELECT -o_orderkey, 'N', -2::BIGINT FROM b
                 WHERE o_orderkey % 13 = 0 AND o_orderkey <> 0)
         SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey
                ELSE b.o_custkey END AS o_custkey
         FROM b FULL OUTER JOIN u ON b.o_orderkey = u.o_orderkey
         ORDER BY o_orderkey""")
  )
}
