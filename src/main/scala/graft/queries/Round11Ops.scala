package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 operator batch — three training-pipeline primitives the
  * surface still lacked:
  *
  *   - q_curation_dsir: DSIR importance weights (Xie et al., NeurIPS'23,
  *     "Data Selection for Language Models via Importance Resampling") —
  *     hashed-feature log-likelihood ratio of a target distribution vs
  *     the raw corpus, THE published recipe for picking pretraining data
  *     that looks like a trusted target set.
  *   - q_dedup_bloom: Bloom-filter membership against a reference shard
  *     — the O(bits) broadcast alternative to a join when deduping new
  *     data against billions of already-ingested keys; uses Spark's OWN
  *     runtime-filter Bloom expressions (functions/BloomFns).
  *   - q_sample_reservoir: per-group fixed-k deterministic reservoir
  *     (md5-keyed order), the bounded-output sampling primitive
  *     curriculum/eval-set construction needs (distinct from
  *     q_sample_stratified's fixed-RATE hash thresholding).
  *
  * Determinism: DSIR's only doubles are `ln_ieee` of exact integers and
  * one left fold over bucket-sorted terms (seed 0.0 ≡ DuckDB's
  * first-element seed since 0+x = x) — the established LnIeee/fold
  * bridge; the Bloom query emits exact counts + contract booleans (the
  * sketch bits differ per engine, the CONTRACT cannot); the reservoir
  * is pure integer/md5 arithmetic.
  */
object Round11Ops {

  private def md5Bucket(c: org.apache.spark.sql.Column, buckets: Int) =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % buckets

  val defs: Seq[QueryDef] = Seq(

    // DSIR: importance weight w(doc) = Σ_f n_f(doc)·λ_f with
    // λ_f = ln p_target(f) − ln p_raw(f) over 256 hashed unigram
    // features, add-1 smoothed; target = the English slice, raw = the
    // whole corpus. Top-20 docs by weight = "most target-like".
    //
    // Scale shape: ONE corpus-scaled pass builds (doc, bucket, count)
    // via a map-side-combined groupBy; target/raw feature tables are
    // 256-row aggregates of it; λ broadcasts back as a 256-row dim; the
    // per-doc weight folds ≤256 sorted terms IN-ROW (no window, no
    // second corpus pass); TakeOrdered keeps 20. At 100 TB the only
    // shuffle is the (doc, bucket) combine — feature hashing is what
    // makes DSIR linear, which is why the paper uses it.
    QueryDef("q_curation_dsir",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        def ln(c: org.apache.spark.sql.Column) =
          call_function("ln_ieee", c.cast("double"))
        val docs = Tables.documents(s, d)
        val feat = docs
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .select(col("doc_id"), col("lang"), md5Bucket(col("w"), 256).as("bucket"))
        // One combine over the exploded stream, staged (r17 optimization
        // round): perDoc/tgt/raw/totals each re-ran the corpus explode +
        // md5 (4 scans in the captured plan). A doc has exactly one
        // lang, so grouping by (doc_id, lang, bucket) carries lang
        // along without changing the (doc_id, bucket) counts; the
        // feature-table counts and totals are exact integer sums of
        // these per-doc counts — identical values, one corpus pass.
        val pdl = graft.ops.StageCache.stage(feat
          .groupBy("doc_id", "lang", "bucket").agg(count(lit(1)).as("cnt")))
        val perDoc = pdl.select("doc_id", "bucket", "cnt")
        val tgt = pdl.filter(col("lang") === "en")
          .groupBy("bucket").agg(sum("cnt").cast("long").as("ct"))
        val raw = pdl.groupBy("bucket").agg(sum("cnt").cast("long").as("cr"))
        val totals = broadcast(pdl.agg(
          sum(when(col("lang") === "en", col("cnt")).otherwise(0L))
            .cast("long").as("nt"),
          sum("cnt").cast("long").as("nr")))
        val lam = raw.join(tgt, Seq("bucket"), "left").crossJoin(totals)
          .select(col("bucket"),
            (ln((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
              (col("nt") + 256L).cast("double")) -
              ln((col("cr") + 1L).cast("double") /
                (col("nr") + 256L).cast("double"))).as("lam"))
        perDoc.join(broadcast(lam), "bucket")
          .groupBy("doc_id")
          .agg(sum("cnt").as("n_tokens"),
            // bucket-sorted left fold, seed 0.0 — bit-equal to the
            // DuckDB list(... ORDER BY bucket) + list_reduce mirror
            aggregate(
              array_sort(collect_list(struct(col("bucket"),
                (col("cnt").cast("double") * col("lam")).as("t")))),
              lit(0.0),
              (acc, x) => acc + x.getField("t")).as("logweight"))
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            col("logweight"))
          .orderBy(col("logweight").desc, col("doc_id").asc)
          .limit(20)
      },
      """WITH words AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5(w), 1, 8))::BIGINT % 256 AS bucket
        |  FROM words WHERE w <> ''),
        |perdoc AS (
        |  SELECT doc_id, bucket, count(*) AS cnt FROM feat GROUP BY 1, 2),
        |tgt AS (SELECT bucket, count(*) AS ct FROM feat WHERE lang = 'en'
        |        GROUP BY 1),
        |raw AS (SELECT bucket, count(*) AS cr FROM feat GROUP BY 1),
        |tot AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt,
        |               count(*) AS nr FROM feat),
        |lam AS (
        |  SELECT r.bucket,
        |    ln((coalesce(t.ct, 0) + 1)::DOUBLE / (tot.nt + 256)::DOUBLE) -
        |    ln((r.cr + 1)::DOUBLE / (tot.nr + 256)::DOUBLE) AS lam
        |  FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket, tot),
        |w AS (
        |  SELECT p.doc_id, sum(p.cnt)::BIGINT AS n_tokens,
        |    list_reduce(list(p.cnt::DOUBLE * l.lam ORDER BY p.bucket),
        |      (a, b) -> a + b) AS logweight
        |  FROM perdoc p JOIN lam l ON p.bucket = l.bucket
        |  GROUP BY 1)
        |SELECT doc_id, n_tokens, logweight FROM w
        |ORDER BY logweight DESC, doc_id ASC LIMIT 20""".stripMargin),

    // Bloom-filter reference-set dedup: the reference shard is every
    // doc_id ≡ 0 (mod 3) ("already ingested"); its text xxhash64 keys
    // build ONE binary Bloom sketch (Spark's runtime-filter aggregate,
    // 2^18 bits for ≤2k keys → negligible FPR), which broadcasts as a
    // 32 KB scalar — the whole point: membership against billions of
    // ingested keys costs O(bits) broadcast + a map-side probe, where
    // the exact join shuffles both corpora. Output is the per-source
    // CALIBRATION (sketch bits are engine-specific; the CONTRACT is
    // not): exact doc/member counts SQL-mirrored, plus booleans pinning
    // the Bloom contract — ZERO false negatives (structural: a Bloom
    // can only err positive) and false-positive rate within bound.
    QueryDef("q_dedup_bloom",
      (s, d) => {
        graft.functions.BloomFns.register(s)
        val docs = Tables.documents(s, d)
        val ref = docs.filter(col("doc_id") % 3 === 0)
        // the sketch collapses to ONE 32 KB binary — collected and
        // re-broadcast as a literal (bounded model state, the kmeans
        // discipline; might_contain requires a constant/scalar input)
        val bf = ref.agg(expr(
          "graft_bloom_agg(xxhash64(text), 4096L, 262144L)").as("bf"))
          .head().getAs[Array[Byte]](0)
        val refTexts = ref.select(col("text")).distinct()
        val probed = docs
          .withColumn("hit",
            call_function("graft_might_contain", lit(bf), xxhash64(col("text"))))
          .join(refTexts.withColumn("is_member", lit(true)), Seq("text"), "left")
          .withColumn("is_member", coalesce(col("is_member"), lit(false)))
        probed.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("is_member"), 1L).otherwise(0L)).as("n_members"),
            // a true member MUST hit (no false negatives — structural)
            min(when(col("is_member"), col("hit")).otherwise(lit(true)))
              .as("no_false_neg"),
            // false positives bounded: ≤ 5% of the non-members
            (sum(when(!col("is_member") && col("hit"), 1L).otherwise(0L))
              .cast("double") <=
              sum(when(!col("is_member"), 1L).otherwise(0L))
                .cast("double") * 0.05 + 0.5).as("fpr_ok"))
          .orderBy("source")
      },
      """SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN text IN (SELECT text FROM documents
                                  WHERE doc_id % 3 = 0)
               THEN 1 ELSE 0 END)::BIGINT AS n_members,
           true AS no_false_neg, true AS fpr_ok
         FROM documents GROUP BY source ORDER BY source"""),

    // Per-group fixed-k deterministic reservoir: 5 docs per source,
    // selected by an md5 order key (uniform, salt-keyed, reproducible —
    // the q_split_hash discipline) with doc_id tiebreak. The window
    // top-k plans as WindowGroupLimit (rank pushdown — Round11Spec
    // pins it), so each group materializes only k rows past the
    // shuffle, never the full partition sort. This is the fixed-SIZE
    // twin of q_sample_stratified's fixed-RATE sampling: eval-set and
    // curriculum construction want exactly-k-per-stratum.
    QueryDef("q_sample_reservoir",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val key = conv(substring(md5(concat(lit("rsv|"),
          col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10)
          .cast("long")
        val w = Window.partitionBy("source").orderBy(col("rkey"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), key.as("rkey"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("source"), col("rk").cast("long").as("rk"),
            col("doc_id"))
          .orderBy("source", "rk")
      },
      """SELECT source, rk::BIGINT AS rk, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY ('0x' || substring(md5('rsv|' || doc_id::VARCHAR), 1, 15))::BIGINT,
                        doc_id) AS rk
           FROM documents) r
         WHERE rk <= 5 ORDER BY source, rk"""),
  )
}
