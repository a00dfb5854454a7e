package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 batch 3: SentencePiece-style unigram-LM tokenizer training
  * (Kudo, ACL 2018) — the EM partner of q_text_bpe_train. Simplified to
  * the deterministic hard-EM (Viterbi-EM) variant every mirrorable-
  * determinism query here uses:
  *
  *   1. SEED: word-frequency table (reduce-to-vocab — the corpus is
  *      scanned ONCE; everything after runs on the Heaps-sublinear
  *      vocab frame), candidate pieces = all substrings of length 1..4
  *      of words of length 1..8, seeded with frequency-weighted counts;
  *      vocab = top-120 candidates by (count DESC, piece ASC) ∪ all
  *      single characters (coverage guarantee).
  *   2. EM round (×2, unrolled): E-step segments every word with its
  *      EXACT Viterbi best under current piece costs — computed by
  *      exhaustive enumeration over the STATIC composition table (all
  *      ways to split a length-n word into parts of length 1..4; 108
  *      compositions at n=8, 223 total — a broadcast dimension, so the
  *      argmin is a relational groupBy + partitioned rank, not a
  *      sequential DP; UnigramSpec proves it equals the classic DP).
  *      Compositions using any out-of-vocab piece are invalid; a
  *      word's previous best segmentation is always still valid, so
  *      coverage never breaks. M-step: piece count = Σ word-freq over
  *      best segmentations; cost = floor((ln(total) − ln(cnt))·1e6) in
  *      micro fixed-point via the ln_ieee intrinsic — EVERY comparison
  *      the argmin makes is on exact BIGINTs, so ties and prune order
  *      are bit-deterministic on both engines.
  *   3. PRUNE ORDER: per-round rank by (count DESC, piece ASC) — the
  *      keep-order a vocab-size target would truncate; pinned in
  *      UnigramSpec against a driver-side reference EM.
  *
  * Words longer than 8 characters are excluded from the trainer (the
  * documented cap that keeps the composition table static; production
  * SentencePiece similarly subsamples/caps trainer input, and long
  * tails go through byte-fallback at tokenization time). Measured
  * justification for keeping the cap (round-14, VERDICT r13 item 8):
  * the documents corpus' longest word is EXACTLY 8 chars (31 distinct
  * lowercase types total, verified at sf0.01; RE-VERIFIED round 15 at
  * all three gate corpora — max word length 8 / 31 types at sf0.001,
  * sf0.01 AND sf0.1) — the cap excludes zero
  * trainer input here, and the length-bucketed extension (compositions
  * grow ~×1.93 per char: 223 at n≤8 → 3095 at n≤12, with the oracle's
  * inline VALUES table growing with it) buys nothing until a corpus
  * actually carries longer words.
  *
  * Scale shape: one corpus scan (word counts); per EM round, the work
  * is |vocab-words| × compositions(len) ≤ ~400 rows per word — a
  * broadcast-joined explode over the vocab frame, two map-side-combined
  * groupBys ((word, comp) score fold; piece counts) and one
  * word-partitioned rank. Vocab-bounded state end to end; the corpus
  * is never rescanned.
  */
object Round13Ops3 {

  private val emRounds = 2
  private val maxWordLen = 8
  private val maxPieceLen = 4
  private val seedTopK = 120

  /** All compositions of n into ordered parts of length 1..maxPieceLen,
    * enumerated first-part-ascending then recursively — the shared
    * deterministic comp_id order both engines tie-break on. */
  private def comps(n: Int): Seq[Seq[Int]] =
    if (n == 0) Seq(Seq.empty)
    else (1 to math.min(n, maxPieceLen)).flatMap(k => comps(n - k).map(k +: _))

  /** Flattened static composition rows (wlen, comp_id, start, plen). */
  private[graft] val compRows: Seq[(Int, Int, Int, Int)] =
    (1 to maxWordLen).flatMap { n =>
      comps(n).zipWithIndex.flatMap { case (parts, cid) =>
        parts.scanLeft(1)(_ + _).zip(parts).map { case (start, plen) =>
          (n, cid, start, plen)
        }
      }
    }

  private def compDf(s: SparkSession): DataFrame = {
    import s.implicits._
    compRows.toDF("wlen", "comp_id", "strt", "plen")
  }

  private val compValuesSql: String =
    compRows.map { case (n, c, st, pl) => s"($n,$c,$st,$pl)" }.mkString(",")

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_text_unigram_train",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        // NOT balanced (r17 optimization round, measured and rejected):
        // `words` re-appears in every EM round's plan, so a rebalance
        // multiplies the keyless repartition's local sort across rounds
        // — measured 2.76 → 4.15 s. Left single-threaded.
        // STAGED instead (same round, second pass): the frame is
        // VOCAB-bounded (31 distinct types in this corpus) but its
        // build is a full corpus explode + regex filter — and every EM
        // round's plan re-ran that build once per `words` consumer.
        // One corpus pass per session; content identical.
        val words = graft.ops.StageCache.stage(Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word").rlike("^[a-z]{1,8}$"))
          .groupBy("word").agg(count(lit(1)).cast("long").as("freq")))

        // seed candidate counts: every substring of length 1..4
        val subs = words
          .select(col("freq"), explode(expr(
            """flatten(transform(sequence(1, length(word)),
              |  i -> transform(sequence(1, least(4, length(word) - i + 1)),
              |    k -> substring(word, i, k))))""".stripMargin)).as("piece"))
          .groupBy("piece").agg(sum("freq").cast("long").as("cnt"))
        val seedTop = subs.orderBy(col("cnt").desc, col("piece").asc)
          .limit(seedTopK)
        val vocab0 = seedTop
          .unionAll(subs.filter(length(col("piece")) === 1))
          .groupBy("piece").agg(max("cnt").cast("long").as("cnt"))

        def costs(vocab: DataFrame): DataFrame = {
          val tot = vocab.agg(sum("cnt").cast("long").as("tot"))
          vocab.crossJoin(broadcast(tot))
            .selectExpr("piece", "cnt",
              """CAST(floor((ln_ieee(CAST(tot AS DOUBLE))
                | - ln_ieee(CAST(cnt AS DOUBLE))) * 1e6) AS BIGINT)
                | AS cost""".stripMargin)
        }

        val cd = compDf(s)
        def emRound(prevCosts: DataFrame): DataFrame = {
          val parts = words
            .join(broadcast(cd), col("wlen") === length(col("word")))
            .select(col("word"), col("freq"), col("comp_id"),
              expr("substring(word, strt, plen)").as("piece"))
          val scoredC = parts
            .join(prevCosts.select("piece", "cost"), Seq("piece"), "left")
            .groupBy("word", "freq", "comp_id")
            .agg(count(lit(1)).as("n_parts"), count("cost").as("n_ok"),
              sum("cost").as("tot_cost"))
            .filter(col("n_ok") === col("n_parts"))
          val best = scoredC
            .withColumn("rn", row_number().over(Window.partitionBy("word")
              .orderBy(col("tot_cost").asc, col("comp_id").asc)))
            .filter(col("rn") === 1)
            .select(col("word"), col("comp_id"))
          val used = best
            .join(words, "word")
            .join(broadcast(cd), col("wlen") === length(col("word"))
              && cd("comp_id") === best("comp_id"))
            .select(col("freq"), expr("substring(word, strt, plen)").as("piece"))
            .groupBy("piece").agg(sum("freq").cast("long").as("cnt"))
          costs(used)
        }

        // eager per-round checkpoint of the vocab-bounded model frame
        // (r17 optimization round): each EM round's lazy plan nested
        // every earlier round's joins and windows, so the union trail
        // re-planned and re-executed the whole chain per branch — the
        // q_quality_lr finding. The frame is ≤ |vocab| rows. The
        // checkpoint feeds the NEXT round only; the round's OUTPUT view
        // stays the lazy frame, so the allowlisted prune-rank window
        // still sits above the round's aggregation chain (the
        // PlanLintSpec boundedness proof) — the lazy view re-executes
        // once in the union, a vocab-bounded read of staged inputs.
        var model = costs(vocab0)
        val rounds = (0 to emRounds).map { i =>
          val frame = model
          if (i < emRounds)
            model = emRound(frame.localCheckpoint(eager = true))
          frame.select(lit(i.toLong).as("iter"), col("piece"), col("cnt"),
            col("cost").as("cost_micro"),
            row_number().over(Window.orderBy(col("cnt").desc, col("piece").asc))
              .cast("long").as("prune_rank"))
        }
        rounds.reduce(_.unionAll(_)).orderBy("iter", "piece")
      }, {
      def roundSql(i: Int): String =
        s"""parts$i AS (
           |  SELECT w.word, w.freq, c.comp_id,
           |    substring(w.word, c.strt, c.plen) AS piece
           |  FROM words w JOIN comps c ON c.wlen = len(w.word)),
           |scored$i AS (
           |  SELECT p.word, p.freq, p.comp_id,
           |    count(*) AS n_parts, count(v.cost) AS n_ok,
           |    sum(v.cost) AS tot_cost
           |  FROM parts$i p LEFT JOIN costs${i - 1} v USING (piece)
           |  GROUP BY 1, 2, 3),
           |best$i AS (
           |  SELECT word, comp_id FROM (
           |    SELECT word, comp_id, row_number() OVER (PARTITION BY word
           |      ORDER BY tot_cost ASC, comp_id ASC) AS rn
           |    FROM scored$i WHERE n_ok = n_parts)
           |  WHERE rn = 1),
           |used$i AS (
           |  SELECT substring(w.word, c.strt, c.plen) AS piece,
           |    sum(w.freq)::BIGINT AS cnt
           |  FROM best$i b JOIN words w USING (word)
           |    JOIN comps c ON c.wlen = len(w.word) AND c.comp_id = b.comp_id
           |  GROUP BY 1),
           |tot$i AS (SELECT sum(cnt)::BIGINT AS tot FROM used$i),
           |costs$i AS (
           |  SELECT piece, cnt,
           |    floor((ln(tot::DOUBLE) - ln(cnt::DOUBLE)) * 1e6)::BIGINT AS cost
           |  FROM used$i CROSS JOIN tot$i)""".stripMargin
      s"""WITH comps(wlen, comp_id, strt, plen) AS (VALUES $compValuesSql),
         |words AS (
         |  SELECT word, count(*)::BIGINT AS freq FROM (
         |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE regexp_full_match(word, '[a-z]{1,8}')
         |  GROUP BY word),
         |subs AS (
         |  SELECT piece, sum(freq)::BIGINT AS cnt FROM (
         |    SELECT freq, unnest(flatten(list_transform(range(1, len(word) + 1),
         |      i -> list_transform(range(1, least(4, len(word) - i + 1) + 1),
         |        k -> substring(word, i::INT, k::INT))))) AS piece
         |    FROM words)
         |  GROUP BY piece),
         |seedtop AS (SELECT piece, cnt FROM subs
         |            ORDER BY cnt DESC, piece ASC LIMIT $seedTopK),
         |vocab0 AS (
         |  SELECT piece, max(cnt)::BIGINT AS cnt FROM (
         |    SELECT * FROM seedtop
         |    UNION ALL SELECT piece, cnt FROM subs WHERE len(piece) = 1)
         |  GROUP BY piece),
         |tot0 AS (SELECT sum(cnt)::BIGINT AS tot FROM vocab0),
         |costs0 AS (
         |  SELECT piece, cnt,
         |    floor((ln(tot::DOUBLE) - ln(cnt::DOUBLE)) * 1e6)::BIGINT AS cost
         |  FROM vocab0 CROSS JOIN tot0),
         |${(1 to emRounds).map(roundSql).mkString(",\n")}
         |${(0 to emRounds).map(i =>
             s"""SELECT $i::BIGINT AS iter, piece, cnt, cost AS cost_micro,
                |  row_number() OVER (ORDER BY cnt DESC, piece ASC)::BIGINT
                |    AS prune_rank
                |FROM costs$i""".stripMargin)
             .mkString("\nUNION ALL\n")}
         |ORDER BY iter, piece""".stripMargin
    }),
  )
}
