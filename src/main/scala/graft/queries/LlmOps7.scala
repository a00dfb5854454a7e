package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextAnalysis

/** Round-9 batch: three curation ops a training pipeline runs between
  * dedup and mixing — weighted subsampling (importance/quality-weighted
  * corpus selection), int8 embedding quantization (the storage/serving
  * format every ANN index at 100 TB actually holds), and duplicate-n-gram
  * coverage (the RefinedWeb/Gopher-style per-document contamination stat
  * one level finer than whole-doc dedup). All three follow the repo's
  * mirrorable-hash discipline (md5 60-bit uniforms, ln_ieee, left-to-right
  * double folds) so DuckDB verifies them hash-for-hash.
  */
object LlmOps7 {

  /** Per-stratum sample size for q_sample_weighted. */
  private val sampleK = 5

  /** 2^60 as a double — the md5 60-bit integer's uniform divisor. Exact
    * in IEEE754 (a power of two), so the division is pure scaling. */
  private val two60 = 1152921504606846976.0

  val defs: Seq[QueryDef] = Seq(

    // Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    // "Weighted random sampling with a reservoir"): each document draws
    // an exponential key  -ln(u)/w  (u uniform, w = n_chars its weight)
    // and the k SMALLEST keys per language stratum are the sample —
    // distribution-identical to sequential weighted draws without
    // replacement, but embarrassingly parallel: the key is a pure
    // projection and per-stratum selection is an ordinary top-k.
    //
    // Determinism: u is the repo's standard mirrorable 60-bit md5 integer
    // over doc_id, shifted to (0,1] by +1 (ln(0) never occurs); ln is
    // ln_ieee (bit-equal to DuckDB's ln); the key is one negate + one
    // divide of exact-valued doubles — no RNG state anywhere, reruns and
    // ablations see the same sample.
    //
    // Scale shape: the exponential-key trick is exactly what makes
    // weighted sampling 100 TB-safe — no global pass to normalize
    // weights, no sequential reservoir. One projection computes keys,
    // and the per-stratum rank ≤ k plans as WindowGroupLimit (the
    // q_cap_per_source shape): each map task keeps at most k rows per
    // stratum before the shuffle, so the exchange carries O(strata · k)
    // rows regardless of corpus size.
    QueryDef("q_sample_weighted",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val h = conv(substring(md5(col("doc_id").cast("string")
          .cast("binary")), 1, 15), 16, 10).cast("long")
        val u = (h + lit(1L)).cast("double") / lit(two60)
        val key = negate(call_function("ln_ieee", u)) /
          col("n_chars").cast("double")
        val w = Window.partitionBy("lang")
          .orderBy(col("sample_key").asc, col("doc_id").asc)
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("n_chars"),
            key.as("sample_key"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= sampleK)
          .select("lang", "rank", "doc_id", "n_chars", "sample_key")
          .orderBy("lang", "rank")
      },
      s"""WITH k AS (
  SELECT lang, doc_id, n_chars,
    (-ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 1)::DOUBLE
         / $two60)) / n_chars::DOUBLE AS sample_key
  FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY lang
        ORDER BY sample_key ASC, doc_id ASC) AS rank FROM k)
SELECT lang, rank::BIGINT AS rank, doc_id, n_chars, sample_key
FROM r WHERE rank <= $sampleK ORDER BY lang, rank"""),

    // Symmetric int8 quantization of the embedding column — the format
    // vector stores and ANN serving tiers actually hold at scale (4×
    // smaller than float32, SIMD-friendly dot products). Per vector:
    // scale = max|x|/127, q_i = floor(x_i/scale + 0.5) (half-up — both
    // engines' floor is IEEE-exact, unlike their round()s, which
    // disagree at halfway points), plus the two quality stats a
    // quantization report needs: saturation count (|q|=127) and the
    // reconstruction sum of squared error.
    //
    // Determinism: max|x| is a left fold with greatest (order-pinned,
    // though max is order-free anyway), SSE is the repo's left-to-right
    // double fold, and every lambda mirrors the dotSql index shape.
    // Scale shape: a pure projection — no shuffle at all; at 100 TB this
    // is a map-only rewrite of the embedding table, and the stats ride
    // along per-row instead of needing a second pass.
    QueryDef("q_emb_quantize",
      (s, d) => {
        val absmax = aggregate(col("embedding"), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double"))))
        val q = transform(col("embedding"),
          x => floor(x.cast("double") / col("scale") + lit(0.5)).cast("long"))
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            (absmax / lit(127.0)).as("scale"))
          .withColumn("q", q)
          .select(col("vec_id"), col("scale"),
            size(filter(col("q"), v => abs(v) === lit(127L)))
              .cast("long").as("n_sat"),
            aggregate(
              zip_with(col("embedding"), col("q"), (x, v) => {
                val dd = x.cast("double") - v.cast("double") * col("scale")
                dd * dd
              }),
              lit(0.0), (acc, v) => acc + v).as("sse"))
          .orderBy("vec_id")
      },
      """WITH sc AS (
  SELECT vec_id, embedding,
    list_reduce(list_prepend(0.0,
      list_transform(embedding, x -> abs(x::DOUBLE))),
      (a, b) -> greatest(a, b)) / 127.0 AS scale
  FROM embeddings),
qq AS (
  SELECT vec_id, embedding, scale,
    list_transform(embedding, x -> floor(x::DOUBLE / scale + 0.5)::BIGINT) AS q
  FROM sc)
SELECT vec_id, scale,
  len(list_filter(q, v -> abs(v) = 127))::BIGINT AS n_sat,
  list_reduce(list_prepend(0.0,
    list_transform(range(len(embedding)),
      i -> (embedding[i+1]::DOUBLE - q[i+1]::DOUBLE * scale)
         * (embedding[i+1]::DOUBLE - q[i+1]::DOUBLE * scale))),
    (a, b) -> a + b) AS sse
FROM qq ORDER BY vec_id"""),

    // Duplicate-5-gram coverage — the per-document contamination stat
    // between exact dedup (whole doc) and q_dedup_substring (64-token
    // windows): what fraction of a document's DISTINCT 5-grams also
    // appear in some other document. RefinedWeb/Gopher-style pipelines
    // threshold on exactly this to drop boilerplate-heavy pages that no
    // whole-doc detector flags.
    //
    // Scale shape: per-doc distinct grams explode once; the gram
    // document-frequency table is a map-side-combined groupBy; the join
    // back attaches an 8-byte count to each (doc, gram) row keyed on the
    // gram string (at web scale the q_text_tfidf_skewsafe head/tail
    // split is the skew answer for stop-phrase grams — noted; the
    // synthetic corpus has no such head). The final per-doc agg shuffles
    // doc_id-keyed counts only — texts never move after the explode.
    QueryDef("q_text_ngram_coverage",
      (s, d) => {
        val ws = TextAnalysis.tokens(col("text"))
        // 5 shifted slices under a zip_with chain (the bigrams shape),
        // NOT `slice(ws, i, 5)` per sequence element — a lambda-
        // positional slice re-evaluates the inlined split per element
        // (the CollapseProject O(L²) trap; hidden at this corpus's doc
        // lengths but real at book-length documents)
        def sj(j: Int) = slice(ws, lit(1 + j), size(ws) - 4)
        val grams = (1 to 4).foldLeft(sj(0))((acc, j) =>
          zip_with(acc, sj(j), (a, b) => concat(a, lit(" "), b)))
        // array_distinct in-row (r17): (doc_id, gram) duplicates only
        // ever occur within one document, so per-doc dedup replaces the
        // corpus-wide distinct — the exploded 5-gram stream no longer
        // shuffles; documentsBalanced parallelizes the gram build
        val docGrams = Tables.documentsBalanced(s, d)
          .filter(size(ws) >= 5)
          .select(col("doc_id"), explode(array_distinct(grams)).as("gram"))
          .localCheckpoint(eager = false) // feeds both the df agg and the join
        val df = docGrams.groupBy("gram").agg(count(lit(1)).as("df"))
        docGrams.join(df, "gram")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"), col("n_grams"), col("n_dup"),
            (col("n_dup").cast("double") / col("n_grams").cast("double"))
              .as("coverage"))
          .orderBy("doc_id")
      },
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 5),
g AS (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(w) - 3),
          i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS gram
      FROM w),
df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
agg AS (SELECT doc_id, count(*) AS n_grams,
          sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM g JOIN df USING (gram) GROUP BY 1)
SELECT doc_id, n_grams::BIGINT AS n_grams, n_dup::BIGINT AS n_dup,
  n_dup::DOUBLE / n_grams::DOUBLE AS coverage
FROM agg ORDER BY doc_id"""),

    // Asymmetric containment (Broder 1997's "containment of A in B",
    // |A∩B|/|A| over bigram sets) — the direction Jaccard blurs: a short
    // doc fully embedded in a long one scores low Jaccard (the union is
    // large) but containment ≈ 1, which is exactly the quote/excerpt/
    // boilerplate-inclusion dup class. Same consecutive-pair measurement
    // shape as q_text_jaccard (candidate GENERATION at scale is the LSH
    // family's job; this is the scoring primitive those candidates flow
    // into).
    //
    // Determinism: set sizes and intersection are exact integers; the
    // two containment ratios and their max are single IEEE divisions.
    QueryDef("q_dedup_containment",
      (s, d) => {
        val sets = Tables.documents(s, d)
          .select(col("doc_id"),
            array_distinct(TextAnalysis.bigrams(split(col("text"), " "), " "))
              .as("sset"))
        val inter = size(array_intersect(col("x.sset"), col("y.sset")))
        sets.as("x").join(sets.as("y"), col("y.doc_id") === col("x.doc_id") + 1)
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            inter.cast("long").as("n_common"),
            (inter.cast("double") / size(col("x.sset"))).as("c_in_1"),
            (inter.cast("double") / size(col("y.sset"))).as("c_in_2"),
            (greatest(inter.cast("double") / size(col("x.sset")),
              inter.cast("double") / size(col("y.sset"))) >= 0.8)
              .as("is_contained"))
          .orderBy("d1")
      },
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws)),
           i -> ws[i] || ' ' || ws[i+1])) AS sset
       FROM w)
SELECT x.doc_id AS d1, y.doc_id AS d2,
  len(list_intersect(x.sset, y.sset))::BIGINT AS n_common,
  len(list_intersect(x.sset, y.sset))::DOUBLE / len(x.sset) AS c_in_1,
  len(list_intersect(x.sset, y.sset))::DOUBLE / len(y.sset) AS c_in_2,
  greatest(len(list_intersect(x.sset, y.sset))::DOUBLE / len(x.sset),
           len(list_intersect(x.sset, y.sset))::DOUBLE / len(y.sset)) >= 0.8
    AS is_contained
FROM sh x JOIN sh y ON y.doc_id = x.doc_id + 1 ORDER BY d1"""),

    // Content-defined chunking (the Rabin/gear-hash storage-dedup
    // primitive, here a 31-polynomial over 8-char windows): cut after
    // any window whose hash ≡ 0 (mod 64) — boundaries move WITH the
    // content, so an insertion early in a document only re-chunks its
    // neighborhood instead of shifting every fixed-size block (the
    // property that makes chunk-level dedup survive edits; also the
    // chunking behind dedup-friendly training-data stores). Expected
    // chunk ≈ 64 chars; chunk identity = md5 of the chunk text.
    //
    // Determinism: the window hash is exact BIGINT arithmetic (max
    // Σ 255·31^j < 2^45); cut positions derive solely from content.
    // Scale shape: pure projection + explode — per-row O(L·8) work, no
    // shuffle at all before the presentation sort; chunk rows carry
    // (doc_id, idx, span, digest), never full text twice.
    //
    // The hash is 8 SHIFTED SLICES combined through a zip_with chain
    // (the bigrams/trigramDigests shape), NOT a per-position
    // `aggregate(slice(chars, i, 8))`: a lambda-positional slice
    // re-evaluates the inlined `split` per element (CollapseProject —
    // the exact O(L²) trap q_multimodal_features hit in round 8), which
    // measured 130 s at sf0.1 where this form runs in ~2 s.
    QueryDef("q_text_cdc_chunks",
      (s, d) => {
        val L = length(col("text"))
        def sj(j: Int) = transform(
          slice(split(col("text"), ""), lit(1 + j), L - 8),
          c => ascii(c).cast("long"))
        val win = (1 to 7).foldLeft(sj(0))((acc, j) =>
          zip_with(acc, sj(j), (a, b) => a * 31 + b))
        // interior cuts only: window [i, i+7] with i+7 < L
        val cutEnds = when(L >= 9,
          filter(zip_with(win, sequence(lit(1), L - 8),
            (h, i) => when(h % 64 === 0, (i + 7).cast("long"))
              .otherwise(lit(-1L))), p => p > 0))
          .otherwise(array().cast("array<bigint>"))
        // Generate barrier (inline over a 1-row struct array — the
        // multimodal round-8 pattern): ends/starts/spans all reference
        // cut_ends, and without the barrier CollapseProject re-inlines
        // the whole hash pipeline into each consumer (~3 evaluations;
        // measured 13 s → ~4 s at sf0.1 with the barrier).
        val ends = concat(col("cut_ends"), array(length(col("text")).cast("long")))
        val starts = concat(array(lit(1L)),
          transform(slice(col("cut_ends"), lit(1), size(col("cut_ends"))),
            e => e + 1))
        // documentsBalanced (r17): the gear-hash window chain is O(L·8)
        // per row and runs in the SCAN stage — a single-row-group local
        // corpus scans as ONE partition, so the whole hash pass ran on
        // one thread; the round-robin rebalance moves the text once and
        // is a no-op on an already-partitioned cluster input
        Tables.documentsBalanced(s, d)
          .select(col("doc_id"), col("text"),
            inline(array(struct(cutEnds.as("cut_ends")))))
          .select(col("doc_id"), col("text"),
            zip_with(starts, ends, (a, b) => struct(a.as("s"), b.as("e")))
              .as("spans"))
          .select(col("doc_id"), col("text"), posexplode(col("spans")))
          .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
            col("col.s").as("start"),
            (col("col.e") - col("col.s") + 1).as("len"),
            md5(col("text").substr(col("col.s").cast("int"),
              (col("col.e") - col("col.s") + 1).cast("int")).cast("binary"))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      """WITH b AS (
  SELECT doc_id, text, string_split(text, '') AS cs, len(text) AS L
  FROM documents),
cuts AS (
  SELECT doc_id, text, L,
    CASE WHEN L >= 9 THEN
      list_transform(
        list_filter(range(1, L - 7),
          i -> list_reduce(list_prepend(0::BIGINT,
                 list_transform(range(0, 8), j -> ascii(cs[i + j])::BIGINT)),
               (acc, c) -> acc * 31 + c) % 64 = 0),
        i -> (i + 7)::BIGINT)
    ELSE [] END AS cut_ends
  FROM b),
spans AS (
  SELECT doc_id, text,
    list_append(cut_ends, L::BIGINT) AS ends,
    list_prepend(1::BIGINT,
      list_transform(list_slice(cut_ends, 1, len(cut_ends)), e -> e + 1))
      AS starts
  FROM cuts),
k AS (SELECT doc_id, text, starts, ends,
        unnest(range(len(starts))) AS ki FROM spans)
SELECT doc_id, ki::BIGINT AS chunk_idx, starts[ki+1] AS start,
  (ends[ki+1] - starts[ki+1] + 1)::BIGINT AS len,
  md5(substr(text, starts[ki+1]::INT, (ends[ki+1] - starts[ki+1] + 1)::INT))
    AS chunk_md5
FROM k ORDER BY doc_id, chunk_idx"""),

    // L2 normalization of the embedding column — the preprocessing step
    // cosine-ANN indexes assume (post-normalize, cosine = dot, which is
    // what the IVF/PQ family actually computes). Emits the normalized
    // vector plus the original norm so downstream can invert.
    //
    // Determinism: the norm is the left-fold dot (the [[Similarity]]
    // contract) and each lane is one IEEE division — the output
    // hash-matches elementwise. Scale shape: pure projection, no
    // shuffle; at 100 TB this is a map-only rewrite pass.
    //
    // Output shape: one row per (vec_id, dim) lane rather than a raw
    // array column — the driver's compare row-sorts every output
    // column, and array cells are unsortable there (r9 lesson: the
    // three array-valued emb queries crashed the gate's pandas sort).
    QueryDef("q_emb_normalize",
      (s, d) => {
        val norm = sqrt(graft.functions.Similarity.dot(
          col("embedding"), col("embedding")))
        Tables.embeddings(s, d)
          .withColumn("norm", norm)
          .select(col("vec_id"), col("norm"),
            posexplode(transform(col("embedding"),
              x => x.cast("double") / col("norm"))).as(Seq("dim", "u")))
          .select(col("vec_id"), col("norm"),
            col("dim").cast("long").as("dim"), col("u"))
          .orderBy("vec_id", "dim")
      },
      s"""WITH n AS (
  SELECT vec_id, embedding,
    sqrt(${graft.functions.Similarity.dotSql("embedding", "embedding")}) AS norm
  FROM embeddings)
SELECT vec_id, norm, d AS dim, embedding[d + 1]::DOUBLE / norm AS u
FROM n, unnest(range(len(embedding))) AS t(d)
ORDER BY vec_id, dim"""),

    // Per-dimension standardization (z-score feature scaling) — the
    // preprocessing step distance-based ML (k-means, kNN, linear
    // models) needs when dimensions carry different scales: corpus
    // mean/std per lane, then z = (v - mean)/std per element.
    //
    // Determinism (the kmeans fixed-point discipline): lanes quantize
    // to 1e-8 BIGINTs (`floor(v·1e8 + 0.5)` — half-up via floor, no
    // round() tie ambiguity); per-dim Σv is an exact BIGINT sum and
    // Σv² sums exact 1e-16-scale products as DECIMAL(38,0) (the
    // product fits i64, only the sum would overflow); mean/std/z then
    // read those exact integers through ONE shared IEEE expression
    // tree, so the output arrays hash-match elementwise. The z output
    // standardizes the QUANTIZED value — exact on both engines, and
    // 1e-8 is far below float32 input precision anyway.
    //
    // Scale shape: the stats pass is one posexplode + map-side-combined
    // groupBy(dim) whose output is DIMS rows; the application pass is
    // map-only — the 32-row stats frame collapses to a dim-ordered
    // array broadcast via crossJoin, and each vector standardizes by
    // positional zip_with. No corpus-scaled lane shuffle on the apply
    // side (the q_emb_quantize shape).
    QueryDef("q_emb_standardize",
      (s, d) => {
        val vfx = floor(col("v").cast("double") * lit(1e8) + lit(0.5)).cast("long")
        val stats = Tables.embeddings(s, d)
          .select(posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("dim"), vfx.as("vfx"))
          .groupBy("dim")
          .agg(count(lit(1)).as("n"), sum("vfx").as("s"),
            sum((col("vfx") * col("vfx")).cast("decimal(38,0)")).as("ss"))
        val mean = (col("s").cast("double") / col("n").cast("double")) / lit(1e8)
        val varnum = col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
        val std = sqrt(varnum / (col("n") - 1L).cast("double")) / lit(1e8)
        val statsArr = stats
          .select(col("dim"), mean.as("mean"), std.as("sd"))
          .agg(array_sort(collect_list(struct(col("dim"), col("mean"), col("sd"))))
            .as("sarr"))
        // Lane-per-row output (not a raw array column): the driver's
        // compare row-sorts every column and can't sort array cells.
        Tables.embeddings(s, d).crossJoin(broadcast(statsArr))
          .select(col("vec_id"),
            posexplode(zip_with(col("embedding"), col("sarr"), (v, st) =>
              (floor(v.cast("double") * lit(1e8) + lit(0.5)) / lit(1e8) -
                st.getField("mean")) / st.getField("sd"))).as(Seq("dim", "z")))
          .select(col("vec_id"), col("dim").cast("long").as("dim"), col("z"))
          .orderBy("vec_id", "dim")
      },
      """WITH lanes AS (
        |  SELECT u.dim AS dim, u.vfx AS vfx FROM (
        |    SELECT unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> {dim: i - 1,
        |            vfx: floor(embedding[i]::DOUBLE * 100000000.0 + 0.5)::BIGINT})) AS u
        |    FROM embeddings)),
        |stats AS (
        |  SELECT dim, count(*) AS n, sum(vfx) AS s,
        |    sum((vfx * vfx)::DECIMAL(38,0)) AS ss
        |  FROM lanes GROUP BY dim),
        |ms AS (
        |  SELECT dim,
        |    (s::DOUBLE / n::DOUBLE) / 100000000.0 AS mean,
        |    sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
        |         / (n - 1)::DOUBLE) / 100000000.0 AS sd
        |  FROM stats),
        |sarr AS (
        |  SELECT list({'mean': mean, 'sd': sd} ORDER BY dim) AS arr FROM ms)
        |SELECT vec_id, d AS dim,
        |  (floor(embedding[d + 1]::DOUBLE * 100000000.0 + 0.5) / 100000000.0
        |    - arr[d + 1].mean) / arr[d + 1].sd AS z
        |FROM embeddings CROSS JOIN sarr, unnest(range(len(embedding))) AS t(d)
        |ORDER BY vec_id, dim""".stripMargin))
}
