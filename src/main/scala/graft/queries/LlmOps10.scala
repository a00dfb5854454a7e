package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextAnalysis

/** Round-9 continuation batch: RAKE candidate phrases, Dunning
  * log-likelihood (G²) keyness per language, and Matryoshka
  * truncated-embedding recall evaluation.
  *
  * Both are classic corpus-curation signals: RAKE surfaces candidate
  * key-phrases without any model (stopword-delimited runs scored by
  * word degree/frequency); G² keyness finds the terms that
  * distinguish one slice of the corpus from the rest — the standard
  * drift/contamination diagnostic when mixing sources.
  *
  * Determinism: every irrational double (ln, degree/freq ratios) is
  * produced by the same IEEE operation order on both engines (ln via
  * the LnIeee intrinsic), and every order-sensitive double sum is an
  * array_sort'd left fold over a position-keyed struct list (the
  * q_text_entropy technique). Ranking ties break on the word/phrase
  * itself, so LIMIT/row_number cuts are stable.
  */
object LlmOps10 {

  val defs: Seq[QueryDef] = Seq(
    // RAKE (Rapid Automatic Keyword Extraction): split each document
    // into candidate phrases at stopword boundaries; word score =
    // degree/frequency where degree counts co-occurring phrase slots;
    // phrase score = sum of its word scores. Scale shape: one
    // per-document running-sum window assigns phrase ids (partitioned
    // by doc — no global window), word stats are one map-side-combined
    // groupBy(word), and the phrase-score join shuffles (word, score)
    // pairs, never documents. The per-phrase fold is bounded by phrase
    // length (longest stopword-free run), not corpus size.
    QueryDef("q_text_rake",
      (s, d) => {
        val stops = TextAnalysis.enStopwords
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "word")
          .withColumn("is_stop", col("word").isInCollection(stops))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val pw = toks
          .withColumn("pid",
            sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
          .filter(!col("is_stop"))
          .select("doc_id", "pid", "pos", "word")
        val plen = pw.groupBy("doc_id", "pid").agg(count(lit(1)).as("plen"))
        val wstats = pw.join(plen, Seq("doc_id", "pid"))
          .groupBy("word")
          .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
          .select(col("word"),
            (col("deg").cast("double") / col("freq").cast("double"))
              .as("wscore"))
        pw.join(wstats, "word")
          .groupBy("doc_id", "pid")
          .agg(array_sort(collect_list(
            struct(col("pos"), col("word"), col("wscore")))).as("ws"))
          .select(
            array_join(transform(col("ws"), e => e.getField("word")), " ")
              .as("phrase"),
            size(col("ws")).cast("long").as("n_words"),
            aggregate(col("ws"), lit(0.0),
              (acc, e) => acc + e.getField("wscore")).as("score"))
          .groupBy("phrase", "n_words", "score")
          .agg(count(lit(1)).cast("long").as("n_occurrences"))
          .orderBy(col("score").desc, col("phrase").asc)
          .limit(20)
      },
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         tok AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, w FROM t),
         m AS (SELECT doc_id, pos, w[pos] AS word,
                 w[pos] IN (${TextAnalysis.enStopwords.map(x => s"'$x'").mkString(", ")}) AS is_stop
               FROM tok),
         ph AS (SELECT doc_id, pos, word, is_stop,
                  sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos) AS pid
                FROM m),
         pw AS (SELECT doc_id, pid, pos, word FROM ph WHERE NOT is_stop),
         plen AS (SELECT doc_id, pid, count(*) AS plen FROM pw GROUP BY 1, 2),
         wstats AS (SELECT word,
                      sum(plen)::DOUBLE / count(*)::DOUBLE AS wscore
                    FROM pw JOIN plen USING (doc_id, pid) GROUP BY word),
         phr AS (SELECT p.doc_id, p.pid,
                   list_sort(list(struct_pack(
                     pos := p.pos, word := p.word, wscore := s.wscore))) AS ws
                 FROM pw p JOIN wstats s USING (word)
                 GROUP BY 1, 2),
         scored AS (SELECT
             array_to_string(list_transform(ws,
               e -> struct_extract(e, 'word')), ' ') AS phrase,
             len(ws)::BIGINT AS n_words,
             list_reduce(list_prepend(0.0, list_transform(ws,
                 e -> struct_extract(e, 'wscore'))),
               (a, b) -> a + b) AS score
           FROM phr)
         SELECT phrase, n_words, score, count(*)::BIGINT AS n_occurrences
         FROM scored GROUP BY 1, 2, 3
         ORDER BY score DESC, phrase ASC LIMIT 20"""),

    // Dunning log-likelihood (G²) keyness: for each language slice,
    // the 10 words most over/under-represented vs the rest of the
    // corpus — 2·(a·ln(a/Eₐ) + b·ln(b/E_b)) over the 2×2 contingency
    // of (word, slice). Scale shape: token counts are two map-side-
    // combined groupBys ((lang, word) then word); the corpus-total
    // join is a broadcast of one row and the per-lang totals a
    // broadcast of |langs| rows; the top-10 cut is a per-lang
    // row_number window over words (WindowGroupLimit prunes it).
    QueryDef("q_text_keyness",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val lw = Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
          .groupBy("lang", "word").agg(count(lit(1)).as("a"))
        val lt = lw.groupBy("lang").agg(sum("a").as("at"))
        val wt = lw.groupBy("word").agg(sum("a").as("ab"))
        val tt = lw.groupBy().agg(sum("a").as("n"))
        val g = lw.join(broadcast(lt), "lang").join(wt, "word")
          .crossJoin(broadcast(tt))
          .select(col("lang"), col("word"), col("a"),
            (col("ab") - col("a")).as("b"),
            (col("at").cast("double") * col("ab").cast("double") /
              col("n").cast("double")).as("ea"),
            ((col("n") - col("at")).cast("double") * col("ab").cast("double") /
              col("n").cast("double")).as("eb"))
          .select(col("lang"), col("word"), col("a"), col("b"),
            (lit(2.0) * (col("a").cast("double") *
                call_function("ln_ieee", col("a").cast("double") / col("ea")) +
              when(col("b") > 0, col("b").cast("double") *
                  call_function("ln_ieee", col("b").cast("double") / col("eb")))
                .otherwise(lit(0.0)))).as("g2"))
        val w = Window.partitionBy("lang")
          .orderBy(col("g2").desc, col("word").asc)
        g.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(col("lang"), col("rk").cast("long").as("rk"), col("word"),
            col("a").cast("long").as("a"), col("b").cast("long").as("b"),
            col("g2"))
          .orderBy("lang", "rk")
      },
      """WITH lw AS (SELECT lang, unnest(string_split(text, ' ')) AS word
                     FROM documents),
         cnt AS (SELECT lang, word, count(*) AS a FROM lw GROUP BY 1, 2),
         lt AS (SELECT lang, sum(a) AS at FROM cnt GROUP BY 1),
         wt AS (SELECT word, sum(a) AS ab FROM cnt GROUP BY 1),
         tt AS (SELECT sum(a) AS n FROM cnt),
         e AS (SELECT c.lang, c.word, c.a, (w.ab - c.a) AS b,
                 l.at::DOUBLE * w.ab::DOUBLE / t.n::DOUBLE AS ea,
                 (t.n - l.at)::DOUBLE * w.ab::DOUBLE / t.n::DOUBLE AS eb
               FROM cnt c JOIN lt l USING (lang) JOIN wt w USING (word)
               CROSS JOIN tt t),
         g AS (SELECT lang, word, a, b,
                 2.0 * (a::DOUBLE * ln(a::DOUBLE / ea) +
                   CASE WHEN b > 0 THEN b::DOUBLE * ln(b::DOUBLE / eb)
                        ELSE 0.0 END) AS g2
               FROM e),
         r AS (SELECT lang, word, a, b, g2,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY g2 DESC, word ASC) AS rk
               FROM g)
         SELECT lang, rk::BIGINT AS rk, word, a::BIGINT AS a, b::BIGINT AS b, g2
         FROM r WHERE rk <= 10 ORDER BY lang, rk"""),

    // Matryoshka-representation evaluation: recall@10 of cosine top-10
    // under PREFIX-truncated embeddings (8/16/32 of 64 dims) against
    // the full-dimension ranking — the measurement that decides how
    // short a nested embedding can be served. Truncation is a zero-
    // cost `slice`; each ranking reuses the q_similarity_topk shape
    // (brute-force scored against a broadcast 5-query set, top-10 via
    // a WindowGroupLimit-prunable row_number); recall joins the two
    // id sets and divides by the full ranking's size, so the output
    // is 3 rows regardless of corpus size. At 100 TB the full-dim
    // ranking would come from the IVF/PQ path instead — the recall
    // harness is unchanged.
    QueryDef("q_emb_matryoshka",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.Similarity
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val pairs = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
        def top10(dims: Int): org.apache.spark.sql.DataFrame = {
          val (a, b) =
            if (dims == 64) (col("embedding"), col("q_emb"))
            else (slice(col("embedding"), 1, dims), slice(col("q_emb"), 1, dims))
          val w = Window.partitionBy("q_id")
            .orderBy(col("cs").desc, col("neighbor_id").asc)
          pairs.select(col("q_id"), col("vec_id").as("neighbor_id"),
              Similarity.cosine(a, b).as("cs"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 10).select("q_id", "neighbor_id")
        }
        val full = top10(64)
        val denom = full.groupBy().agg(count(lit(1)).as("n_full"))
        Seq(8, 16, 32).map { dd =>
          top10(dd).join(full, Seq("q_id", "neighbor_id"))
            .groupBy().agg(count(lit(1)).as("hits"))
            .crossJoin(broadcast(denom))
            .select(lit(dd.toLong).as("dims"), col("hits"), col("n_full"),
              (col("hits").cast("double") / col("n_full").cast("double"))
                .as("recall_at_10"))
        }.reduce(_.unionAll(_)).orderBy("dims")
      }, {
        import graft.functions.Similarity
        def rankCte(name: String, expr1: String, expr2: String) =
          s"""$name AS (SELECT q_id, neighbor_id FROM (
                SELECT q.q_id, e.vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY q.q_id ORDER BY
                    ${Similarity.cosineSql(expr1, expr2)} DESC, e.vec_id ASC) AS rn
                FROM embeddings e, q WHERE e.vec_id <> q.q_id)
              WHERE rn <= 10)"""
        def sliced(dd: Int) =
          rankCte(s"t$dd", s"list_slice(e.embedding, 1, $dd)",
            s"list_slice(q.q_emb, 1, $dd)")
        s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                       FROM embeddings WHERE vec_id < 5),
           ${rankCte("full_rank", "e.embedding", "q.q_emb")},
           ${sliced(8)}, ${sliced(16)}, ${sliced(32)},
           denom AS (SELECT count(*) AS n_full FROM full_rank),
           u AS (
             SELECT 8::BIGINT AS dims, count(*) AS hits
             FROM t8 JOIN full_rank USING (q_id, neighbor_id)
             UNION ALL
             SELECT 16::BIGINT, count(*)
             FROM t16 JOIN full_rank USING (q_id, neighbor_id)
             UNION ALL
             SELECT 32::BIGINT, count(*)
             FROM t32 JOIN full_rank USING (q_id, neighbor_id))
           SELECT dims, hits, n_full::BIGINT AS n_full,
             hits::DOUBLE / n_full::DOUBLE AS recall_at_10
           FROM u CROSS JOIN denom ORDER BY dims"""
      }),

    // Exact set-similarity join via PREFIX FILTERING (the AllPairs /
    // PPJoin candidate rule) over 4-GRAM SHINGLE sets: under one
    // global shingle ordering (rarest-first), two sets with Jaccard ≥ t
    // MUST share a shingle among each set's first |x| − ⌈t·|x|⌉ + 1
    // entries — the inverted index is built over prefixes only,
    // candidates come from a shingle equi-join, and exact verification
    // runs on the surviving sliver. 100% recall BY CONSTRUCTION — the
    // deterministic counterpart to the probabilistic MinHash-LSH path,
    // and the baseline every set-similarity system cites. Shingle
    // granularity is what makes the filter selective: this corpus
    // draws documents from a ~30-word vocabulary (word-set prefixes
    // degenerate — measured 110 s of all-pairs verification), but the
    // 4-gram space is combinatorial, so rarest-first prefix postings
    // hold a handful of docs and candidates collapse to true near-dups.
    // ⌈0.8n⌉ is the integer (4n+4) div 5; the verification threshold
    // is the integer cross-multiplication 5·i ≥ 4·u — no double ever
    // enters the candidate rule.
    QueryDef("q_dedup_prefixjoin",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val W = 4
        val ws = split(col("text"), " ")
        val shingles = when(size(ws) >= W,
          array_distinct(transform(sequence(lit(1), size(ws) - W + 1),
            i => concat_ws("_", slice(ws, i, lit(W))))))
          .otherwise(array().cast("array<string>"))
        // documentsBalanced (r17): the per-doc 4-gram shingle build is
        // the map-heavy stage and otherwise runs single-threaded on the
        // one-row-group local scan; no-op on real multi-file input.
        val sets = Tables.documentsBalanced(s, d)
          .select(col("doc_id"), shingles.as("sh"))
          .localCheckpoint(eager = false)
        // n = |set| is size(sh) — known BEFORE the explode, so the old
        // unordered count() window over the token stream is gone (one
        // window pass over the corpus-wide (doc, gram) rows saved; r17)
        val toks = sets.select(col("doc_id"), size(col("sh")).as("n"),
          explode(col("sh")).as("g"))
        val freq = toks.groupBy("g").agg(count(lit(1)).as("df"))
        val ranked = toks.join(freq, "g")
          .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("df").asc, col("g").asc)))
          .filter(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
          .select("doc_id", "g")
        val cand = ranked.as("x").join(ranked.as("y"),
            expr("x.g = y.g AND x.doc_id < y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        val inter = size(array_intersect(col("a.sh"), col("b.sh")))
        cand
          .join(sets.as("a"), col("d1") === col("a.doc_id"))
          .join(sets.as("b"), col("d2") === col("b.doc_id"))
          .select(col("d1"), col("d2"),
            (inter.cast("double") /
              (size(col("a.sh")) + size(col("b.sh")) - inter)).as("jaccard"),
            (inter * 5).as("i5"),
            ((size(col("a.sh")) + size(col("b.sh")) - inter) * 4).as("u4"))
          // integer cross-multiplication: J >= 0.8 <=> 5*i >= 4*u
          .filter(col("i5") >= col("u4"))
          .select("d1", "d2", "jaccard")
          .orderBy("d1", "d2")
      },
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sets AS (SELECT doc_id,
             CASE WHEN len(ws) >= 4 THEN
               list_distinct(list_transform(range(1, len(ws) - 4 + 2),
                 i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2] || '_' || ws[i+3]))
             ELSE [] END AS sh
           FROM w),
         toks AS (SELECT doc_id, unnest(sh) AS g FROM sets),
         freq AS (SELECT g, count(*) AS df FROM toks GROUP BY 1),
         ranked AS (
           SELECT doc_id, g FROM (
             SELECT t.doc_id, t.g,
               count(*) OVER (PARTITION BY t.doc_id) AS n,
               row_number() OVER (PARTITION BY t.doc_id
                 ORDER BY f.df ASC, t.g ASC) AS rk
             FROM toks t JOIN freq f USING (g))
           WHERE rk <= n - (4 * n + 4) // 5 + 1),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM ranked x JOIN ranked y
                  ON x.g = y.g AND x.doc_id < y.doc_id),
         v AS (SELECT d1, d2,
                 len(list_intersect(a.sh, b.sh)) AS i,
                 len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
               FROM cand JOIN sets a ON d1 = a.doc_id JOIN sets b ON d2 = b.doc_id)
         SELECT d1, d2, i::DOUBLE / u::DOUBLE AS jaccard
         FROM v WHERE 5 * i >= 4 * u ORDER BY d1, d2"""),

    // Semantic-dedup operating curve: candidate pairs from the 4-bit
    // sign-bucket join (the q_dedup_embcos_bucketed shape) counted at
    // four cosine tiers in ONE pass — the number a curation team reads
    // before picking its dedup threshold ("how much do we delete at
    // 0.95 vs 0.8?"). Conditional counts over the bucketed join add
    // nothing to its cost; output is one row at any corpus size.
    // Cosines come from the shared left-fold dot (bit-equal in the
    // oracle); counts are exact integers.
    QueryDef("q_dedup_embcos_sweep",
      (s, d) => {
        import graft.functions.Similarity
        val e = Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.signBucket(col("embedding"), 4))
        val a = e.select(col("vec_id").as("d1"), col("embedding").as("e1"),
          col("bucket"))
        val b = e.select(col("vec_id").as("d2"), col("embedding").as("e2"),
          col("bucket"))
        a.join(b, Seq("bucket")).filter(col("d1") < col("d2"))
          .select(Similarity.cosine(col("e1"), col("e2")).as("cos"))
          .groupBy().agg(
            count(lit(1)).as("n_candidates"),
            sum(when(col("cos") >= 0.99, 1L).otherwise(0L)).as("ge99"),
            sum(when(col("cos") >= 0.95, 1L).otherwise(0L)).as("ge95"),
            sum(when(col("cos") >= 0.90, 1L).otherwise(0L)).as("ge90"),
            sum(when(col("cos") >= 0.80, 1L).otherwise(0L)).as("ge80"))
      },
      s"""WITH e AS (SELECT vec_id, embedding,
             ${graft.functions.Similarity.signBucketSql("embedding", 4)} AS bucket
           FROM embeddings),
         p AS (SELECT ${graft.functions.Similarity.cosineSql("a.embedding", "b.embedding")} AS cos
               FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         SELECT count(*) AS n_candidates,
           sum(CASE WHEN cos >= 0.99 THEN 1 ELSE 0 END)::BIGINT AS ge99,
           sum(CASE WHEN cos >= 0.95 THEN 1 ELSE 0 END)::BIGINT AS ge95,
           sum(CASE WHEN cos >= 0.90 THEN 1 ELSE 0 END)::BIGINT AS ge90,
           sum(CASE WHEN cos >= 0.80 THEN 1 ELSE 0 END)::BIGINT AS ge80
         FROM p"""),

    // MOSS-style local-similarity pair detection: documents sharing
    // winnowing fingerprints (the q_text_winnowing selection chain —
    // k=8 char-grams, w=4 windows, robust min-pos tiebreak) joined on
    // fingerprint hash, scored by shared count and containment
    // (shared / min(n_fp)). Position-aware where MinHash is not: only
    // VERBATIM substrings produce shared fingerprints, so this is the
    // plagiarism/licence-scan primitive. Over-common fingerprints
    // (df > 64 — boilerplate) are dropped before the join, exactly
    // what MOSS does, so posting lists stay bounded and the join
    // volume is Σ df² over RARE fingerprints. All counts exact
    // integers; one final IEEE division for containment.
    QueryDef("q_dedup_winnowing",
      (s, d) => {
        val base = Tables.documentsBalanced(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 1024).as("txt"))
          .select(col("doc_id"), col("txt"),
            (length(col("txt")) - graft.functions.Winnow.K + 1).as("n"))
          .filter(col("n") >= graft.functions.Winnow.W)
        // fingerprint selection is map-only array work ([[Winnow]]);
        // the per-doc h-set is array_distinct'd BEFORE the explode, so
        // the only shuffled rows are the fingerprint-density (doc, h)
        // postings the join actually needs
        val fps = graft.functions.Winnow.withSel(base)
          .select(col("doc_id"), explode(
            expr("array_distinct(transform(sel, key -> key div 2048))"))
            .as("h"))
          .localCheckpoint(eager = false)
        val nfp = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
        val rare = fps.join(
          fps.groupBy("h").agg(count(lit(1)).as("df"))
            .filter(col("df") <= 64), "h")
        val pairs = rare.as("x").join(rare.as("y"),
            expr("x.h = y.h AND x.doc_id < y.doc_id"))
          .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .agg(count(lit(1)).as("shared"))
        pairs
          .join(nfp.withColumnRenamed("doc_id", "d1")
            .withColumnRenamed("n_fp", "fp1"), "d1")
          .join(nfp.withColumnRenamed("doc_id", "d2")
            .withColumnRenamed("n_fp", "fp2"), "d2")
          .select(col("d1"), col("d2"), col("shared"),
            col("fp1"), col("fp2"),
            (col("shared").cast("double") /
              least(col("fp1"), col("fp2")).cast("double")).as("containment"))
          .orderBy(col("shared").desc, col("d1").asc, col("d2").asc)
          .limit(20)
      },
      s"""WITH d0 AS (
        |  SELECT doc_id, substr(text, 1, 1024) AS txt FROM documents),
        |d1 AS (
        |  SELECT doc_id, txt, (length(txt) - 8 + 1) AS n
        |  FROM d0 WHERE (length(txt) - 8 + 1) >= 4),
        |${graft.functions.Winnow.selSqlCtes("d1")},
        |fps AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(sel, key -> key // 2048))) AS h
        |  FROM fp),
        |nfp AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1),
        |rare AS (SELECT f.doc_id, f.h FROM fps f
        |         JOIN (SELECT h, count(*) AS df FROM fps GROUP BY 1
        |               HAVING count(*) <= 64) r ON f.h = r.h),
        |pairs AS (
        |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS shared
        |  FROM rare x JOIN rare y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.d1, p.d2, p.shared::BIGINT AS shared,
        |  a.n_fp::BIGINT AS fp1, b.n_fp::BIGINT AS fp2,
        |  p.shared::DOUBLE / least(a.n_fp, b.n_fp)::DOUBLE AS containment
        |FROM pairs p JOIN nfp a ON p.d1 = a.doc_id JOIN nfp b ON p.d2 = b.doc_id
        |ORDER BY shared DESC, d1 ASC, d2 ASC LIMIT 20""".stripMargin))
}
