package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 late batch (tokenizer + association mining): BPE merge
  * training — the tokenizer-construction step (Sennrich et al. 2016)
  * every LLM data pipeline runs before token counting means anything —
  * and market-basket pair mining (support/lift), the co-occurrence
  * association primitive behind recommendation candidates and
  * "frequently bought together".
  *
  * Both follow the repo's mirrorable-determinism discipline: exact
  * integer counts everywhere, single IEEE divisions for the ratio
  * outputs, (count DESC, key ASC) tie-breaks pinned on both engines.
  */
object LlmOps8 {

  /** Number of unrolled BPE merge iterations. */
  private val bpeRounds = 3

  /** Adjacent symbol pairs of the space-joined symbol string, exploded
    * with the word's corpus frequency. Rows with fewer than two symbols
    * contribute no pairs (slice/zip_with both see length-0 slices). */
  private def pairRows(syms: DataFrame): DataFrame = {
    val arr = col("arr")
    syms
      .withColumn("arr", split(col("sym"), " "))
      .filter(size(arr) >= 2)
      .withColumn("pair", explode(zip_with(
        slice(arr, lit(1), size(arr) - 1),
        slice(arr, lit(2), size(arr) - 1),
        (a, b) => concat(a, lit(" "), b))))
      .groupBy("pair").agg(sum("freq").as("cnt"))
  }

  /** One BPE merge round: count weighted adjacent pairs, pick the
    * (cnt DESC, pair ASC) argmax, apply the merge to every symbol
    * string. Returns (next syms frame, this round's 1-row merge table).
    *
    * The merge application is the classic space-doubling trick (the
    * same left-to-right non-overlapping semantics as the original BPE
    * reference loop, without regex lookarounds DuckDB's RE2 lacks):
    * double every separator so each adjacent pair owns a private
    * delimiter, literal-replace " a  b " with " ab ", then collapse
    * runs of spaces. `replace` scans left-to-right and resumes AFTER
    * the substitution on both engines, which is exactly BPE's greedy
    * non-overlapping merge order.
    */
  /** The merge application expression, exposed for PropertySpec's fuzz
    * pin against the reference greedy left-to-right merge. */
  private[graft] def mergeExpr(sym: Column, bp: Column): Column = {
    val doubled = concat(lit(" "), replace(sym, lit(" "), lit("  ")), lit(" "))
    val pat = concat(lit(" "), replace(bp, lit(" "), lit("  ")), lit(" "))
    val rep = concat(lit(" "), replace(bp, lit(" "), lit("")), lit(" "))
    trim(regexp_replace(replace(doubled, pat, rep), " +", " "))
  }

  private def bpeRound(syms: DataFrame, iter: Int): (DataFrame, DataFrame) = {
    val best = pairRows(syms)
      .orderBy(col("cnt").desc, col("pair").asc).limit(1)
      .select(col("pair").as("bp"), col("cnt").as("bcnt"))
    val next = syms.crossJoin(broadcast(best))
      .withColumn("sym", mergeExpr(col("sym"), col("bp")))
      .select("word", "freq", "sym")
    val merges = best.select(
      lit(iter.toLong).as("iter"),
      col("bp").as("pair"),
      replace(col("bp"), lit(" "), lit("")).as("new_sym"),
      col("bcnt").as("cnt"))
    (next, merges)
  }

  /** DuckDB mirror of one BPE round, as three CTEs. Kept textually
    * parallel to [[bpeRound]] — one definition, two renderings. */
  private def bpeRoundSql(i: Int): String = {
    s"""pairs$i AS (
       |  SELECT pair, sum(freq)::BIGINT AS cnt
       |  FROM (SELECT freq,
       |          unnest(list_transform(range(1, len(string_split(sym, ' '))),
       |            j -> string_split(sym, ' ')[j] || ' ' || string_split(sym, ' ')[j+1])) AS pair
       |        FROM syms$i)
       |  GROUP BY pair),
       |best$i AS (
       |  SELECT pair AS bp, cnt AS bcnt FROM pairs$i
       |  ORDER BY cnt DESC, pair ASC LIMIT 1),
       |syms${i + 1} AS (
       |  SELECT word, freq,
       |    trim(regexp_replace(
       |      replace(' ' || replace(sym, ' ', '  ') || ' ',
       |              ' ' || replace(bp, ' ', '  ') || ' ',
       |              ' ' || replace(bp, ' ', '') || ' '),
       |      ' +', ' ', 'g')) AS sym
       |  FROM syms$i CROSS JOIN best$i)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // BPE merge training (Sennrich, Haddow & Birch, ACL 2016 — "Neural
    // Machine Translation of Rare Words with Subword Units"): build the
    // word-frequency table, explode each word into characters, then
    // greedily merge the most frequent adjacent symbol pair for
    // `bpeRounds` unrolled iterations. Output = the learned merge table
    // (iteration, pair, merged symbol, weighted count) — the artifact a
    // tokenizer ships.
    //
    // Scale shape: this is the textbook reduce-to-vocab pattern. The
    // ONLY corpus-scaled work is the initial token count (map-side
    // combined groupBy whose output is the vocabulary, Heaps-law
    // sublinear in corpus size). Every merge iteration — pair counting,
    // argmax, merge application — runs over the VOCAB frame, weighted
    // by stored frequencies; the corpus is never rescanned. The argmax
    // plans as TakeOrdered(1) (never a global sort) and broadcasts one
    // row back onto the vocab; at petabyte scale each round's vocab
    // frame would be checkpointed like the PageRank edge list, but its
    // size is vocab-bounded either way.
    //
    // Determinism: weighted counts are exact BIGINTs; the merge pick
    // tie-breaks (cnt DESC, pair ASC); symbolization is the ASCII-only
    // per-char regex (both regex engines agree per code point on
    // [a-z]); the space-doubling literal replace has identical
    // left-to-right semantics on both engines.
    QueryDef("q_text_bpe_train",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word").rlike("^[a-z]+$"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
        var syms = words.withColumn("sym",
          trim(regexp_replace(col("word"), "(.)", "$1 ")))
        val merged = (0 until bpeRounds).map { i =>
          val (next, m) = bpeRound(syms, i + 1)
          syms = next
          m
        }
        merged.reduce(_.unionAll(_)).orderBy("iter")
      },
      s"""WITH words AS (
         |  SELECT word, count(*) AS cnt FROM (
         |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE regexp_full_match(word, '[a-z]+')
         |  GROUP BY word),
         |syms0 AS (
         |  SELECT word, cnt AS freq,
         |    trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
         |  FROM words),
         |${(0 until bpeRounds).map(bpeRoundSql).mkString(",\n")}
         |${(0 until bpeRounds).map(i =>
              s"SELECT ${i + 1}::BIGINT AS iter, bp AS pair, " +
              s"replace(bp, ' ', '') AS new_sym, bcnt AS cnt FROM best$i")
              .mkString("\nUNION ALL\n")}
         |ORDER BY iter""".stripMargin),

    // Market-basket pair mining: distinct (order, part) baskets, all
    // within-order part pairs oriented p1 < p2, scored by support
    // (co-occurrence fraction of baskets) and lift (observed co-rate
    // over the independence expectation) — the association-rule
    // primitive (Agrawal & Srikant, VLDB 1994) behind "frequently
    // bought together" candidate generation.
    //
    // Scale shape: the pair expansion is per-basket C(n,2) with n the
    // basket's line count — bounded by basket size (TPC-H ≤ 7; a
    // real pipeline caps outlier baskets with the per-bucket-cap
    // idiom before expanding). Pair counting and the per-part basket
    // counts are map-side-combined groupBys; the part-count attach
    // joins a part-dim-bounded frame (broadcast here; shuffle-hash
    // once a part dim outgrows broadcast), and the basket total is a
    // single broadcast row. Ratios are single IEEE divisions of exact
    // BIGINTs; top-20 plans as TakeOrdered.
    QueryDef("q_basket_pairs",
      (s, d) => {
        // distinct baskets staged once (r17 optimization round): the
        // pair join consumed b twice and partN/total once more — four
        // distinct rebuilds off the single-row-group scan.
        val b = graft.ops.StageCache.stage(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct())
        // Within-basket pairs generated IN-ROW from the per-order sorted
        // part list instead of the orderkey self-join: baskets are
        // line-count-bounded (TPC-H ≤ 7), so the C(n,2) expansion per
        // row is tiny, and the join's two orderkey exchanges collapse
        // into one groupBy exchange. sort_array ⇒ ps[i] < ps[j] for
        // i < j — exactly the b1.l_partkey < b2.l_partkey orientation;
        // identical pair multiset, identical counts.
        val baskets = b.groupBy("l_orderkey")
          .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
        val pairs = baskets
          .select(explode(flatten(transform(col("ps"), (x, i) =>
            transform(slice(col("ps"), i + lit(2),
                greatest(size(col("ps")) - i - lit(1), lit(0))),
              y => struct(x.as("p1"), y.as("p2")))))).as("pr"))
          .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
          .agg(count(lit(1)).as("n12"))
        val partN = b.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        val total = b.agg(countDistinct(col("l_orderkey")).as("n_baskets"))
        pairs
          .join(broadcast(partN.select(col("l_partkey").as("p1"), col("n").as("n1"))), "p1")
          .join(broadcast(partN.select(col("l_partkey").as("p2"), col("n").as("n2"))), "p2")
          .crossJoin(broadcast(total))
          .select(col("p1"), col("p2"), col("n12"),
            (col("n12").cast("double") / col("n_baskets").cast("double")).as("support"),
            ((col("n12") * col("n_baskets")).cast("double") /
              (col("n1") * col("n2")).cast("double")).as("lift"))
          .orderBy(col("n12").desc, col("p1").asc, col("p2").asc)
          .limit(20)
      },
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT b1.l_partkey AS p1, b2.l_partkey AS p2, count(*) AS n12
        |  FROM b b1 JOIN b b2
        |    ON b1.l_orderkey = b2.l_orderkey AND b1.l_partkey < b2.l_partkey
        |  GROUP BY 1, 2),
        |pn AS (SELECT l_partkey, count(*) AS n FROM b GROUP BY 1),
        |tot AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM b)
        |SELECT p1, p2, n12,
        |  n12::DOUBLE / n_baskets::DOUBLE AS support,
        |  (n12 * n_baskets)::DOUBLE / (n1 * n2)::DOUBLE AS lift
        |FROM pairs
        |  JOIN (SELECT l_partkey AS p1, n AS n1 FROM pn) USING (p1)
        |  JOIN (SELECT l_partkey AS p2, n AS n2 FROM pn) USING (p2)
        |  CROSS JOIN tot
        |ORDER BY n12 DESC, p1 ASC, p2 ASC LIMIT 20""".stripMargin),

    // Audio-shaped multimodal processing: fixed-width PCM framing with
    // per-frame RMS energy and a silence flag — the VAD / silence-trim
    // front end of every speech-data pipeline (frame energy decides
    // what is worth sending to an ASR model). The "decode" is the
    // repo's deterministic fake (chars as centered samples, space = 0 —
    // the container ships no audio codec; the multimodal contract is
    // that the FRAMING/aggregation plumbing is real), same stance as
    // q_multimodal_features' pseudo-byte histogram.
    //
    // Scale shape: framing is PARTITION-LOCAL — one projection builds
    // the per-frame struct list (each frame's sum-of-squares via
    // `aggregate` over a 64-sample slice; total work O(samples) per
    // row) and one explode emits samples/64 rows; no per-sample
    // explode, no (doc, frame)-keyed shuffle at all — the only
    // exchange in the plan is the output sort. Energy is an exact
    // BIGINT sum of squares; rms = sqrt(ss/n) is two IEEE ops on
    // exact ints, bit-equal on both engines; the silence flag is total.
    QueryDef("q_multimodal_audio",
      (s, d) => {
        val codes = transform(split(col("text"), ""),
          c => (ascii(c) - 32).cast("long"))
        val base = Tables.documents(s, d).select(
          col("doc_id"), length(col("text")).cast("long").as("n"),
          inline(array(struct(codes.as("codes")))))
        val nFrames = ((col("n") + 63L) / lit(64L)).cast("long")
        val ns = least(lit(64L), col("n") - col("idx") * 64L)
        val rms = sqrt(col("ss").cast("double") / col("n_samples").cast("double"))
        base
          .select(col("doc_id"), col("n"), col("codes"),
            explode(sequence(lit(0L), nFrames - 1L)).as("idx"))
          .select(col("doc_id"), col("idx").as("frame"),
            ns.as("n_samples"),
            aggregate(slice(col("codes"), (col("idx") * 64L + 1L).cast("int"), ns.cast("int")),
              lit(0L), (a, x) => a + x * x).as("ss"))
          .select(col("doc_id"), col("frame"), col("n_samples"), col("ss"),
            rms.as("rms"), (rms < 68.0).as("is_silence"))
          .orderBy("doc_id", "frame")
      },
      """WITH c AS (SELECT doc_id, length(text) AS n, text FROM documents),
        |f AS (SELECT doc_id, n, text, unnest(range(0, (n + 63) // 64)) AS idx
        |      FROM c),
        |s AS (SELECT doc_id, idx AS frame,
        |        least(64, n - idx * 64)::BIGINT AS n_samples,
        |        list_reduce(list_prepend(0::BIGINT,
        |          list_transform(range(idx*64 + 1, idx*64 + least(64, n - idx*64) + 1),
        |            i -> ((ascii(substring(text, i, 1)) - 32)::BIGINT
        |                  * (ascii(substring(text, i, 1)) - 32)::BIGINT))),
        |          (a, b) -> a + b) AS ss
        |      FROM f)
        |SELECT doc_id, frame::BIGINT AS frame, n_samples, ss,
        |  sqrt(ss::DOUBLE / n_samples::DOUBLE) AS rms,
        |  sqrt(ss::DOUBLE / n_samples::DOUBLE) < 68.0 AS is_silence
        |FROM s ORDER BY doc_id, frame""".stripMargin),

    // Feature hashing ("the hashing trick", Weinberger et al. 2009):
    // bag-of-words folded into a fixed 64-bucket sparse vector per
    // document via the repo's mirrorable 60-bit md5 — the
    // vocabulary-free vectorization every large-scale linear/GBDT
    // baseline uses (no vocab build pass, no OOV problem, bounded
    // width). Output = doc_id, active bucket count, L1 mass, and the
    // sparse "bucket:count" CSV in bucket order.
    //
    // Scale shape: explode → one (doc_id, bucket)-keyed map-side
    // combined groupBy → one doc_id-keyed aggregation; both shuffles
    // carry short keys and pre-combined counts, and the vector width
    // is a constant — no vocabulary state anywhere (that absence IS
    // the operator). The CSV render is an array_sort over ≤ 64
    // entries per doc.
    QueryDef("q_text_hashfeatures",
      (s, d) => {
        val bucket = (conv(substring(md5(col("word").cast("binary")), 1, 15),
          16, 10).cast("long") % 64).as("bucket")
        Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .select(col("doc_id"), bucket)
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_active"),
            sum("cnt").as("l1_mass"),
            concat_ws(";", transform(
              array_sort(collect_list(struct(col("bucket"), col("cnt")))),
              e => concat(e.getField("bucket"), lit(":"), e.getField("cnt"))))
              .as("features_csv"))
          .orderBy("doc_id")
      },
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(word), 1, 15))::BIGINT % 64 AS bucket,
        |    count(*) AS cnt
        |  FROM w GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_active, sum(cnt)::BIGINT AS l1_mass,
        |  string_agg(bucket::VARCHAR || ':' || cnt::VARCHAR, ';'
        |    ORDER BY bucket) AS features_csv
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin),
  )
}
