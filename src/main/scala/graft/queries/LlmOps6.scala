package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextAnalysis

/** Round-8 second batch: the data-ORDERING and corpus-STATISTICS ops a
  * training pipeline runs after curation settles — reproducible epoch
  * shuffling (every serious run pins its data order to a seed) and
  * PMI-scored collocations (the statistical phrase/term-association pass
  * behind tokenizer merges and stop-phrase lists). Both follow the repo's
  * mirrorable-hash / bit-exact-ln discipline so DuckDB verifies them
  * hash-for-hash.
  */
object LlmOps6 {

  /** Shard count for the epoch shuffle — 8 at demo scale; production uses
    * the output file count (~1e5), which only widens the window
    * parallelism. Declared before `defs`: the oracle interpolates it. */
  private val shuffleShards = 8L

  /** PMI floor: bigram pairs below this count don't get scored (sparse
    * counts make PMI a noise amplifier — the classic min-count guard). */
  private val pmiMinCount = 25L

  /** Per-band bucket cap for q_dedup_editdist candidate generation — the
    * same skew guard as q_dedup_minhash_capped: a boilerplate-heavy
    * corpus (every page opening with the same 8 tokens) would otherwise
    * push one bucket toward bucket². Mirrored in the oracle. */
  private val editBucketCap = 16

  val defs: Seq[QueryDef] = Seq(

    // Deterministic epoch reshuffle — the data-ordering step of a
    // training run: each epoch must visit the corpus in a different but
    // REPRODUCIBLE pseudo-random order (resume-from-step and ablation
    // reruns depend on it). The order key is the repo's standard
    // mirrorable 60-bit md5 integer over (epoch ':' doc_id) — a new
    // permutation per epoch, no RNG state anywhere.
    //
    // Scale shape: a training shuffle never needs ONE global sequence —
    // it needs shard files whose within-shard order is pinned. So the
    // key's low bits pick a shard and the rank window partitions by
    // (epoch, shard): E·S independent partitions (production S ~ 1e5
    // output files makes every window partition corpus/S sized), vs the
    // single-reducer-per-epoch collapse a global row_number() would be.
    // The one shuffle carries (epoch, shard) keys; at the sink this is
    // exactly partitionBy("epoch", "shard") + sortWithinPartitions.
    QueryDef("q_shuffle_epoch",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val key = conv(substring(md5(concat(col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10)
          .cast("long")
        val w = Window.partitionBy("epoch", "shard")
          .orderBy(col("shuffle_key").asc, col("doc_id").asc)
        Tables.documents(s, d)
          .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("epoch"))
          .withColumn("shuffle_key", key)
          .withColumn("shard", pmod(col("shuffle_key"), lit(shuffleShards)))
          .withColumn("rank", row_number().over(w).cast("long"))
          .select("epoch", "shard", "rank", "doc_id", "shuffle_key")
          .orderBy("epoch", "shard", "rank")
      },
      s"""WITH e AS (SELECT doc_id, unnest([0, 1])::BIGINT AS epoch FROM documents),
k AS (SELECT epoch, doc_id,
        ('0x' || substring(md5(epoch::VARCHAR || ':' || doc_id::VARCHAR), 1, 15))::BIGINT
          AS shuffle_key
      FROM e)
SELECT epoch, shuffle_key % $shuffleShards AS shard,
  (row_number() OVER (PARTITION BY epoch, shuffle_key % $shuffleShards
                      ORDER BY shuffle_key ASC, doc_id ASC))::BIGINT AS rank,
  doc_id, shuffle_key
FROM k ORDER BY epoch, shard, rank"""),

    // PMI bigram collocations — pointwise mutual information
    // ln(p(w1,w2) / (p(w1)·p(w2))) over adjacent-word pairs, the
    // association score behind tokenizer merge candidates, multi-word
    // expression mining, and stop-phrase lists (Church & Hanks 1990).
    // Low-count pairs are floored out ([[pmiMinCount]]) — PMI explodes on
    // sparse counts.
    //
    // Bit-exactness: the ratio mixes three magnitudes (counts, token
    // total², bigram total) whose integer product can pass 2^63, so
    // instead of one fused ratio the score is the ln-sum
    //   ln(c12) + 2·ln(NT) − ln(NB) − ln(c1) − ln(c2)
    // — every term is ln_ieee of an EXACT integer cast to double, and
    // the +/− chain associates left in both engines, so the doubles
    // agree bit-for-bit (the q_text_unigram_nll discipline).
    //
    // Scale shape: bigram extraction is the zip_with projection (no
    // O(L²) exploded carry — the q_vocab_ngrams shape), counts partial-
    // aggregate map-side (wordcount), and the PMI join attaches unigram
    // counts to BIGRAM-COUNT rows: both sides are vocab-bounded model
    // state, never corpus-scaled, so the unigram table broadcasts (at a
    // 1e7-type vocabulary, the q_text_tfidf_skewsafe head/tail split is
    // the fallback — noted, not needed for a counts⋈counts join).
    QueryDef("q_text_collocations",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val docs = Tables.documents(s, d)
        val ws = split(col("text"), " ")
        // both count frames feed two consumers (the join and their total)
        // — lazy checkpoints stop the full corpus agg running twice
        val bgc = docs
          .select(explode(TextAnalysis.bigrams(ws, " ")).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("n_pair"))
          .localCheckpoint(eager = false)
        val uni = docs
          .select(explode(ws).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false)
        val totals = uni.agg(sum("cnt").as("nt"))
          .crossJoin(bgc.agg(sum("n_pair").as("nb")))
        def ln(c: org.apache.spark.sql.Column) =
          call_function("ln_ieee", c.cast("double"))
        val pmi = ln(col("n_pair")) + lit(2.0) * ln(col("nt")) -
          ln(col("nb")) - ln(col("c1")) - ln(col("c2"))
        bgc
          .select(split(col("bigram"), " ")(0).as("w1"),
            split(col("bigram"), " ")(1).as("w2"), col("n_pair"))
          .filter(col("n_pair") >= pmiMinCount)
          .join(broadcast(uni.select(col("word").as("w1"), col("cnt").as("c1"))), "w1")
          .join(broadcast(uni.select(col("word").as("w2"), col("cnt").as("c2"))), "w2")
          .crossJoin(broadcast(totals))
          .select(col("w1"), col("w2"), col("n_pair"), pmi.as("pmi"))
          .orderBy("w1", "w2")
      },
      s"""WITH bg AS (
  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
  FROM documents),
bgc AS (SELECT string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2,
          count(*) AS n_pair
        FROM bg GROUP BY 1, 2),
uni AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
unic AS (SELECT word, count(*) AS cnt FROM uni GROUP BY 1),
tot AS (SELECT (SELECT sum(cnt) FROM unic) AS nt,
               (SELECT sum(n_pair) FROM bgc) AS nb)
SELECT w1, w2, n_pair::BIGINT AS n_pair,
  ln(n_pair::DOUBLE) + 2.0 * ln(nt::DOUBLE) - ln(nb::DOUBLE)
    - ln(c1.cnt::DOUBLE) - ln(c2.cnt::DOUBLE) AS pmi
FROM bgc
  JOIN unic c1 ON bgc.w1 = c1.word
  JOIN unic c2 ON bgc.w2 = c2.word, tot
WHERE n_pair >= $pmiMinCount ORDER BY w1, w2"""),

    // Edit-distance near-duplicate pairs — the character-level dup class
    // the set-based detectors blur: minhash/simhash score WORD-SET
    // overlap, so a single in-place word substitution in a long document
    // barely moves Jaccard yet is exactly what a levenshtein bound
    // catches (and conversely a word-order scramble scores Jaccard 1.0
    // but a huge edit distance). Pairs within 20% relative edit distance
    // (edit·5 ≤ max length) are reported.
    //
    // Candidate contract (declared, like q_dedup_prefix's): a reported
    // pair must agree on its first 8 OR last 8 tokens — i.e. at least
    // one end of the document is edit-free. Pairs edited at BOTH ends
    // fall to the minhash family; in exchange candidates come from two
    // md5 band keys instead of an N² scan. Three bounds keep the
    // verify set a sliver at any corpus size: (a) per-band buckets cap
    // at [[editBucketCap]] members (WindowGroupLimit planning — the
    // capped-LSH skew guard; random text never fills it, boilerplate
    // text can't exceed it), (b) the band self-join carries only ids +
    // lengths + 16-byte keys, (c) a length guard IMPLIED by the edit
    // threshold (|len1−len2| ≤ edit ≤ mx/5) prunes before texts are
    // ever fetched — full documents join in only for surviving
    // candidate pairs, and the O(L²) levenshtein kernel runs on that
    // sliver alone.
    QueryDef("q_dedup_editdist",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ws = split(col("text"), " ")
        val keyed = Tables.documents(s, d)
          .filter(size(ws) >= 8)
          .select(col("doc_id"), col("n_chars"),
            md5(concat_ws(" ", slice(ws, 1, 8)).cast("binary")).as("kpre"),
            md5(concat_ws(" ", slice(ws, -8, 8)).cast("binary")).as("ksuf"))
        val bands = keyed
          .select(col("doc_id"), col("n_chars"),
            explode(array(col("kpre"), col("ksuf"))).as("bucket"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("bucket").orderBy("doc_id")))
          .filter(col("rn") <= editBucketCap)
          .select("doc_id", "n_chars", "bucket")
          // self-joins below — one materialization of the banded sliver
          .localCheckpoint(eager = false)
        val cand = bands.as("x").join(bands.as("y"),
            col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id") &&
              abs(col("x.n_chars") - col("y.n_chars")) * 5 <=
                greatest(col("x.n_chars"), col("y.n_chars")))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        // both text fetches STREAM the documents scan against a broadcast
        // candidate sliver (ids first, then ids + one text) — the corpus
        // side is never broadcast and never shuffled; if candidates ever
        // outgrew broadcast, the fallback is a doc_id-keyed shuffle of
        // the sliver, still never of the corpus
        val t = Tables.documents(s, d).select("doc_id", "text", "n_chars")
        val withA = t.join(broadcast(cand), col("doc_id") === col("d1"))
          .select(col("d1"), col("d2"),
            col("text").as("t1"), col("n_chars").as("c1"))
        t.join(broadcast(withA), col("doc_id") === col("d2"))
          .select(col("d1"), col("d2"),
            levenshtein(col("t1"), col("text")).cast("long").as("edit"),
            greatest(col("c1"), col("n_chars")).cast("long").as("max_chars"))
          .filter(col("edit") * 5 <= col("max_chars"))
          .orderBy("d1", "d2")
      },
      s"""WITH d AS (SELECT doc_id, text, n_chars, string_split(text, ' ') AS w
         FROM documents WHERE len(string_split(text, ' ')) >= 8),
keyed AS (SELECT doc_id, n_chars,
            md5(array_to_string(list_slice(w, 1, 8), ' ')) AS kpre,
            md5(array_to_string(list_slice(w, -8, -1), ' ')) AS ksuf
          FROM d),
bands AS (SELECT doc_id, n_chars, bucket FROM (
            SELECT doc_id, n_chars, unnest([kpre, ksuf]) AS bucket FROM keyed) b0),
capped AS (SELECT doc_id, n_chars, bucket FROM (
             SELECT doc_id, n_chars, bucket,
               row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
             FROM bands) c0 WHERE rn <= $editBucketCap),
cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         FROM capped x JOIN capped y
           ON x.bucket = y.bucket AND x.doc_id < y.doc_id
         WHERE abs(x.n_chars - y.n_chars) * 5 <= greatest(x.n_chars, y.n_chars)),
p AS (SELECT d1, d2, levenshtein(a.text, b.text) AS edit,
        greatest(a.n_chars, b.n_chars) AS mx
      FROM cand JOIN documents a ON a.doc_id = d1
                JOIN documents b ON b.doc_id = d2)
SELECT d1, d2, edit::BIGINT AS edit, mx::BIGINT AS max_chars
FROM p WHERE edit * 5 <= mx ORDER BY d1, d2"""),

    // Bigram Stupid-Backoff NLL — the CCNet-style LM quality filter one
    // model class up from q_text_unigram_nll: each document is scored by
    // a bigram language model TRAINED ON THE TRAIN SPLIT ONLY (the same
    // content-hash 80% as q_split_hash, so held-out docs are scored by a
    // model that never saw them — scoring the training data with itself
    // overstates quality). Stupid Backoff (Brants et al. 2007, "Large
    // language models in machine translation"): score(w2|w1) = c12/c1
    // when the model keeps the bigram, else 0.4·c(w2)/NT, else a
    // 0.4²·1/NT OOV floor; the model prunes singleton bigrams (c12 ≥ 2
    // — the count-cutoff every production LM table applies).
    //
    // Bit-exactness: every tier is ln_ieee of ONE division of exact
    // BIGINTs (0.4·c2/NT = 2·c2/(5·NT); 0.16/NT = 4/(25·NT)) and the
    // per-doc sum is the (w1,w2)-sorted left fold — the bm25/nll
    // recipe. Scale shape: the only corpus-scaled shuffles are the two
    // bigram count groupBys; the model join keys (w1,w2) against the
    // pruned train table (vocab²-bounded; at a web-scale bigram table
    // the q_text_tfidf_skewsafe head/tail split is the skew answer),
    // unigram/total state broadcasts.
    QueryDef("q_text_bigram_nll",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val docs = Tables.documents(s, d)
        def bg(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
            explode(TextAnalysis.bigrams(split(col("text"), " "), " ")).as("bigram"))
          .select(col("doc_id"), split(col("bigram"), " ")(0).as("w1"),
            split(col("bigram"), " ")(1).as("w2"))
        val tf12 = bg(docs).groupBy("doc_id", "w1", "w2")
          .agg(count(lit(1)).as("tf12"))
        val train = docs.filter(pmod(
          conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
            .cast("long"), lit(100L)) < 80)
        val tbg = bg(train).groupBy("w1", "w2")
          .agg(count(lit(1)).as("c12")).filter(col("c12") >= 2)
        val tuni = train
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false) // feeds c1, c2, and the total
        val nt = tuni.agg(sum("cnt").as("nt"))
        def ln(c: org.apache.spark.sql.Column) = call_function("ln_ieee", c)
        val score =
          when(col("c12").isNotNull,
            ln(col("c12").cast("double") / col("c1").cast("double")))
          .when(col("c2").isNotNull,
            ln((col("c2") * 2).cast("double") / (col("nt") * 5).cast("double")))
          .otherwise(ln(lit(4).cast("double") / (col("nt") * 25).cast("double")))
        val terms = tf12
          .join(tbg, Seq("w1", "w2"), "left")
          .join(broadcast(tuni.select(col("word").as("w1"), col("cnt").as("c1"))),
            Seq("w1"), "left")
          .join(broadcast(tuni.select(col("word").as("w2"), col("cnt").as("c2"))),
            Seq("w2"), "left")
          .crossJoin(broadcast(nt))
          .select(col("doc_id"), col("w1"), col("w2"), col("tf12"),
            when(col("c12").isNull, col("tf12")).otherwise(lit(0L)).as("bo"),
            (col("tf12") * score).as("term"))
        terms.groupBy("doc_id")
          .agg(sum("tf12").as("n_bg"), sum("bo").as("n_backoff"),
            array_sort(collect_list(struct(col("w1"), col("w2"), col("term"))))
              .as("wt"))
          .select(col("doc_id"), col("n_bg"), col("n_backoff"),
            (lit(-1.0) * aggregate(
              transform(col("wt"), e => e.getField("term")),
              lit(0.0), (acc, x) => acc + x) / col("n_bg").cast("double"))
              .as("nll"))
          .orderBy("doc_id")
      },
      """WITH bgall AS (
  SELECT doc_id, string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
        FROM documents) b0),
tf12 AS (SELECT doc_id, w1, w2, count(*) AS tf12 FROM bgall GROUP BY 1, 2, 3),
train AS (SELECT * FROM documents
          WHERE ('0x' || substring(md5(text), 1, 15))::BIGINT % 100 < 80),
tbg AS (SELECT string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2,
          count(*) AS c12
        FROM (SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
              FROM train) t0
        GROUP BY 1, 2 HAVING count(*) >= 2),
tuni AS (SELECT word, count(*) AS cnt FROM
           (SELECT unnest(string_split(text, ' ')) AS word FROM train) u0 GROUP BY 1),
tot AS (SELECT sum(cnt) AS nt FROM tuni),
terms AS (
  SELECT doc_id, f.w1, f.w2, tf12,
    CASE WHEN c12 IS NULL THEN tf12 ELSE 0 END AS bo,
    tf12 * (CASE
      WHEN c12 IS NOT NULL THEN ln(c12::DOUBLE / u1.cnt::DOUBLE)
      WHEN u2.cnt IS NOT NULL THEN ln((u2.cnt * 2)::DOUBLE / (nt * 5)::DOUBLE)
      ELSE ln(4::DOUBLE / (nt * 25)::DOUBLE) END) AS term
  FROM tf12 f
    LEFT JOIN tbg g ON f.w1 = g.w1 AND f.w2 = g.w2
    LEFT JOIN tuni u1 ON f.w1 = u1.word
    LEFT JOIN tuni u2 ON f.w2 = u2.word, tot),
agg AS (SELECT doc_id, sum(tf12) AS n_bg, sum(bo) AS n_backoff,
          list_sort(list(struct_pack(w1 := w1, w2 := w2, term := term))) AS wt
        FROM terms GROUP BY 1)
SELECT doc_id, n_bg::BIGINT AS n_bg, n_backoff::BIGINT AS n_backoff,
  -1.0 * list_reduce(list_prepend(0.0,
    list_transform(wt, e -> struct_extract(e, 'term'))),
    (a, b) -> a + b) / n_bg::DOUBLE AS nll
FROM agg ORDER BY doc_id"""),

    // Vocabulary growth curve (Heaps' law): cumulative distinct BIGRAM
    // count as the corpus is consumed in doc_id order — the coverage
    // diagnostic behind tokenizer-vocab sizing and "is more data still
    // adding anything" calls. Bigrams, not unigrams: the synthetic
    // corpus's closed word vocabulary saturates in two docs, while the
    // bigram space keeps growing (the spirit of the law).
    //
    // Scale design: distinct tracking never materializes a running set —
    // each gram's FIRST doc (min(doc_id), map-side-combined groupBy)
    // reduces the curve to a prefix sum of per-doc new-gram counts, one
    // row per introducing doc. The prefix sum itself is DISTRIBUTED
    // (no single-partition window over the doc axis): within-shard
    // running sums partition by doc_id div 64, and the per-shard totals
    // — #shards rows, 64× smaller — take the one ordered window; at
    // petabyte doc counts that fan-in level recurses (shard-of-shards),
    // the classic tree prefix-sum. The oracle is the plain running-sum
    // window, pinning that the two-level rewrite is exact.
    QueryDef("q_vocab_growth",
      (s, d) => {
        val grams = Tables.documents(s, d).select(col("doc_id"),
          explode(TextAnalysis.bigrams(TextAnalysis.tokens(col("text")), " "))
            .as("gram"))
        val nw = grams.groupBy("gram").agg(min("doc_id").as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("new_grams"))
          .withColumn("shard", expr("doc_id div 64"))
        val inShard = nw.withColumn("cum_in",
          sum("new_grams").over(Window.partitionBy("shard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val offsets = nw.groupBy("shard").agg(sum("new_grams").as("tot"))
          .withColumn("off",
            coalesce(sum("tot").over(Window.orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("shard", "off")
        inShard.join(offsets, "shard")
          .select(col("doc_id").cast("long").as("doc_id"),
            col("new_grams").cast("long").as("new_grams"),
            (col("cum_in") + col("off")).cast("long").as("vocab_size"))
          .orderBy("doc_id")
      },
      """WITH t AS (SELECT doc_id,
             unnest(list_transform(range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1])) AS gram
           FROM documents),
         f AS (SELECT gram, min(doc_id) AS doc_id FROM t GROUP BY 1),
         nw AS (SELECT doc_id, count(*) AS new_grams FROM f GROUP BY 1)
         SELECT doc_id::BIGINT AS doc_id, new_grams::BIGINT AS new_grams,
           (sum(new_grams) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING))::BIGINT AS vocab_size
         FROM nw ORDER BY doc_id"""))
}
