package graft.queries

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
WHERE n_pair >= $pmiMinCount ORDER BY w1, w2"""))
}
