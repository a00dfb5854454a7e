package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 additions, batch 2 — corpus statistics and fingerprinting:
  * the full covariance/correlation matrix over the embedding column
  * (the Gramian every PCA/whitening pipeline starts from), MOSS-style
  * winnowing fingerprints (the classic robust local-minimum document
  * fingerprint, cf. Schleimer/Wilkerson/Aiken SIGMOD'03), WET-style
  * HTML→text extraction (the first stage of every web-corpus pipeline),
  * and the top principal component by power iteration over that
  * covariance (distributed Gramian pass + bounded driver-side solve).
  *
  * Determinism follows the house rules: floats quantize to BIGINT
  * lanes before any aggregation (the q_emb_standardize discipline —
  * but at 1e-4 here, not 1e-8: covariance SUMS cross products, and
  * 1e-4 lanes keep every Σv·v and Σv·Σv term below 2^53, so each
  * DECIMAL/BIGINT→DOUBLE read is exact on both engines; at 1e-8 the
  * ~1e20 sums round differently in DuckDB's int128→double path),
  * integer products sum as DECIMAL(38,0), hashes are md5-derived
  * BIGINTs via the shared `conv(substring(md5(x),1,n),16,10)` ≡
  * `('0x' || substring(md5(x),1,n))::BIGINT` bridge, and every final
  * double is ONE shared IEEE expression over exact integers.
  */
object LlmOps9 {

  /** Shared Gramian pieces for q_emb_covariance / q_emb_pca_power:
    * (pair-product sums over the upper triangle, per-dim stats).
    * Lanes quantize at 1e-4 (see object scaladoc). */
  private def covParts(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val a = transform(col("embedding"),
      x => floor(x.cast("double") * lit(1e4) + lit(0.5)).cast("long"))
    val emb = Tables.embeddingsBalanced(s, d).select(a.as("a"))
    val pstats = emb
      .select(explode(expr(
        """flatten(transform(sequence(0, size(a)-1), i ->
          |  transform(sequence(i, size(a)-1), j ->
          |    named_struct('i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT),
          |                 'p', a[i] * a[j]))))""".stripMargin)).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
      // two-stage exact sum: BIGINT partials within a partition (a
      // 128 MB parquet split holds ≲1e6 vectors × 6.25e10 max |p| —
      // ten orders below Long overflow), DECIMAL(38,0) only across
      // partitions. Long-sum codegen in the hot inner loop, decimal
      // precision on the (#partitions × d²/2)-row merge — same exact
      // value, ~2× less CPU than summing decimals row-by-row.
      .groupBy(col("i"), col("j"), spark_partition_id().as("pid"))
      .agg(sum(col("p")).as("pp"))
      .groupBy("i", "j")
      .agg(sum(col("pp").cast("decimal(38,0)")).as("spp"))
    val dstats = emb
      .select(posexplode(col("a")).as(Seq("dim", "v")))
      .groupBy(col("dim").cast("long").as("dim"), spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("nn"), sum("v").as("svv"),
        sum(col("v") * col("v")).as("ssvv"))
      .groupBy("dim")
      .agg(sum("nn").as("n"), sum("svv").as("sv"),
        sum(col("ssvv").cast("decimal(38,0)")).as("ssv"))
      .select(col("dim"), col("n"), col("sv"),
        (col("ssv").cast("double") -
          col("sv").cast("double") * col("sv").cast("double") /
            col("n").cast("double")).as("varnum"))
    (pstats, dstats)
  }

  /** Upper-triangle covariance entries (i, j, cov) — the exact
    * expression q_emb_covariance's `cov` column verifies. */
  private def covUpper(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val (pstats, dstats) = covParts(s, d)
    val di = dstats.select(col("dim").as("di"), col("n"), col("sv").as("si"))
    val dj = dstats.select(col("dim").as("dj"), col("sv").as("sj"))
    val covnum = col("spp").cast("double") -
      col("si").cast("double") * col("sj").cast("double") /
        col("n").cast("double")
    pstats
      .join(broadcast(di), col("i") === col("di"))
      .join(broadcast(dj), col("j") === col("dj"))
      .select(col("i"), col("j"),
        (covnum / (col("n") - 1L).cast("double") / lit(1e8)).as("cov"))
  }

  /** Dominant covariance eigenpair by 30 power-iteration steps on the
    * DRIVER over the collected d×d matrix (bounded model state, the
    * kmeans/PQ discipline). Every fold seeds with the FIRST term and
    * accumulates ascending, matching the DuckDB list_reduce left fold
    * bit-for-bit — q_emb_pca_power verifies that equivalence, and
    * q_emb_residual reuses the vector as a literal. */
  private def topComponent(s: org.apache.spark.sql.SparkSession, d: String)
      : (Array[Double], Double) = {
    // covariance staged once per session (r17): q_emb_pca_power and
    // q_emb_residual each rebuilt the identical upper-triangle pair
    // aggregation; the staged frame is d(d+1)/2 deterministic rows —
    // gate mode (no cache dir) runs the full build per consumer
    val rows = graft.ops.StageCache.keyed(s, s"emb_cov:$d")(covUpper(s, d))
      .collect() // d(d+1)/2 rows — bounded model state
    val dim = rows.iterator.map(_.getLong(1)).max.toInt + 1
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val c = r.getDouble(2); m(i)(j) = c; m(j)(i) = c
    }
    var v = Array.fill(dim)(1.0)
    var nrm = 0.0
    for (_ <- 1 to 30) {
      val w = Array.tabulate(dim) { i =>
        var acc = m(i)(0) * v(0)
        var j = 1
        while (j < dim) { acc += m(i)(j) * v(j); j += 1 }
        acc
      }
      var ss = w(0) * w(0)
      var i = 1
      while (i < dim) { ss += w(i) * w(i); i += 1 }
      nrm = math.sqrt(ss)
      v = w.map(_ / nrm)
    }
    (v, nrm)
  }

  /** The q_emb_pca_power oracle's covariance + power-iteration CTE
    * prefix (everything up to an `it` table holding the iterate `v`
    * at k=30) — shared with q_emb_residual's oracle. */
  private val pcaCtePrefix: String =
    """WITH RECURSIVE lanes AS (
      |  SELECT list_transform(embedding,
      |    x -> floor(x::DOUBLE * 1e4 + 0.5)::BIGINT) AS a FROM embeddings),
      |pairs AS (
      |  SELECT u.i AS i, u.j AS j, u.p AS p FROM (
      |    SELECT unnest(flatten(list_transform(range(len(a)), i ->
      |      list_transform(range(i, len(a)), j ->
      |        {i: i, j: j, p: a[i+1] * a[j+1]})))) AS u FROM lanes)),
      |pstats AS (
      |  SELECT i, j, sum(p::DECIMAL(38,0)) AS spp FROM pairs GROUP BY i, j),
      |dstats AS (
      |  SELECT u.dim AS dim, count(*) AS n, sum(u.v) AS sv FROM (
      |    SELECT unnest(list_transform(range(len(a)),
      |      i -> {dim: i, v: a[i+1]})) AS u FROM lanes) GROUP BY u.dim),
      |cov AS (
      |  SELECT i, j,
      |    (spp::DOUBLE - di.sv::DOUBLE * dj.sv::DOUBLE / di.n::DOUBLE)
      |      / (di.n - 1)::DOUBLE / 1e8 AS c
      |  FROM pstats JOIN dstats di ON i = di.dim JOIN dstats dj ON j = dj.dim),
      |fullcov AS (
      |  SELECT i, j, c FROM cov
      |  UNION ALL SELECT j AS i, i AS j, c FROM cov WHERE i <> j),
      |mat AS (SELECT i, list(c ORDER BY j) AS row_ FROM fullcov GROUP BY i),
      |m AS (SELECT list(row_ ORDER BY i) AS mm FROM mat),
      |it AS (
      |  SELECT 0 AS k, list_transform(range(len(mm)), x -> 1.0::DOUBLE) AS v,
      |    0.0::DOUBLE AS nrm FROM m
      |  UNION ALL
      |  SELECT k + 1, list_transform(w, x -> x / nrm2) AS v, nrm2 AS nrm FROM (
      |    SELECT k, w,
      |      sqrt(list_reduce(list_transform(w, x -> x * x),
      |        (a, b) -> a + b)) AS nrm2 FROM (
      |      SELECT k, list_transform(range(len(mm)), i ->
      |        list_reduce(list_transform(range(len(mm)),
      |          j -> mm[i+1][j+1] * v[j+1]), (a, b) -> a + b)) AS w
      |      FROM it, m) w1) w2
      |  WHERE k < 30)""".stripMargin

  /** Per-doc DEFLATE stats (doc_id, n_chars_len, n_raw, n_deflate,
    * ratio) over a (doc_id, text) frame: one Deflater per task,
    * streaming output counting — zlib lives outside Catalyst, so this
    * is one of the repo's few legitimate mapPartitions codecs. The
    * registered q_text_compression aggregates this into its banded
    * calibration; OpsSpec pins the per-doc planted contract here. */
  private[graft] def deflateStats(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_chars_len", LongType, nullable = false),
      StructField("n_raw", LongType, nullable = false),
      StructField("n_deflate", LongType, nullable = false),
      StructField("ratio", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    docs.mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
      val buf = new Array[Byte](1 << 16)
      rows.map { r =>
        val raw = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        deflater.reset()
        deflater.setInput(raw)
        deflater.finish()
        var out = 0L
        while (!deflater.finished()) out += deflater.deflate(buf)
        // empty documents would divide by zero (Infinity in a
        // nullable=false double, poisoning the band calibration
        // downstream); define their ratio as 1.0 (incompressible)
        val ratio = if (raw.length == 0) 1.0
                    else out.toDouble / raw.length.toDouble
        Row(r.getLong(0), r.getString(1).length.toLong, raw.length.toLong,
          out, ratio)
      }
    }(enc)
  }

  val defs: Seq[QueryDef] = Seq(

    // Covariance + Pearson correlation matrix of the embedding lanes —
    // upper triangle (i ≤ j), d(d+1)/2 = 2080 rows at d=64. The pair
    // products are generated ROW-LOCALLY (nested transform + one
    // explode): no self-join, no corpus-sized shuffle — partial
    // aggregation combines each partition down to 2080 groups before
    // the exchange, so the shuffle volume is #partitions × 2080
    // regardless of N. That is the distributed Gramian X'X pattern;
    // CPU is the irreducible N·d²/2 multiply-adds. Per-dim sums ride
    // the small side and broadcast back twice for the mean/variance
    // corrections.
    QueryDef("q_emb_covariance",
      (s, d) => {
        val (pstats, dstats) = covParts(s, d)
        val di = dstats.select(col("dim").as("di"), col("n"),
          col("sv").as("si"), col("varnum").as("vi"))
        val dj = dstats.select(col("dim").as("dj"),
          col("sv").as("sj"), col("varnum").as("vj"))
        val covnum = col("spp").cast("double") -
          col("si").cast("double") * col("sj").cast("double") /
            col("n").cast("double")
        pstats
          .join(broadcast(di), col("i") === col("di"))
          .join(broadcast(dj), col("j") === col("dj"))
          .select(col("i"), col("j"),
            (covnum / (col("n") - 1L).cast("double") / lit(1e8)).as("cov"),
            (covnum / sqrt(col("vi") * col("vj"))).as("corr"))
          .orderBy("i", "j")
      },
      """WITH lanes AS (
        |  SELECT list_transform(embedding,
        |    x -> floor(x::DOUBLE * 1e4 + 0.5)::BIGINT) AS a
        |  FROM embeddings),
        |pairs AS (
        |  SELECT u.i AS i, u.j AS j, u.p AS p FROM (
        |    SELECT unnest(flatten(list_transform(range(len(a)), i ->
        |      list_transform(range(i, len(a)), j ->
        |        {i: i, j: j, p: a[i+1] * a[j+1]})))) AS u
        |    FROM lanes)),
        |pstats AS (
        |  SELECT i, j, sum(p::DECIMAL(38,0)) AS spp
        |  FROM pairs GROUP BY i, j),
        |dims AS (
        |  SELECT u.dim AS dim, u.v AS v FROM (
        |    SELECT unnest(list_transform(range(len(a)),
        |      i -> {dim: i, v: a[i+1]})) AS u
        |    FROM lanes)),
        |dstats AS (
        |  SELECT dim, count(*) AS n, sum(v) AS sv,
        |    (sum((v*v)::DECIMAL(38,0))::DOUBLE
        |      - sum(v)::DOUBLE * sum(v)::DOUBLE / count(*)::DOUBLE) AS varnum
        |  FROM dims GROUP BY dim)
        |SELECT i, j,
        |  (spp::DOUBLE - di.sv::DOUBLE * dj.sv::DOUBLE / di.n::DOUBLE)
        |    / (di.n - 1)::DOUBLE / 1e8 AS cov,
        |  (spp::DOUBLE - di.sv::DOUBLE * dj.sv::DOUBLE / di.n::DOUBLE)
        |    / sqrt(di.varnum * dj.varnum) AS corr
        |FROM pstats
        |  JOIN dstats di ON i = di.dim
        |  JOIN dstats dj ON j = dj.dim
        |ORDER BY i, j""".stripMargin),

    // Winnowing fingerprints (SIGMOD'03): 8-char k-gram hashes, window
    // w=4, rightmost-minimum selection — the guarantee is every match
    // of length ≥ k+w−1 shares a fingerprint, with ~2/(w+1) density.
    // The whole selection chain ([[graft.functions.Winnow]]) is pure
    // array expressions inside one row — the per-position hash array,
    // the per-window packed-key mins (`h·2048 + (2047 − pos)`:
    // BIGINT MIN = (min hash, max pos)), the pos-dedup — so the
    // operator is MAP-ONLY: no explode, no shuffle, just the final
    // per-doc summary projection. (Earlier shape: ~4 window rows per
    // k-gram through two hash exchanges — 5.5 s at sf0.1 vs ~1 s
    // in-register.) Text capped at 1 KiB per doc (curation-pipeline
    // convention for fingerprinting).
    QueryDef("q_text_winnowing",
      (s, d) => {
        val base = Tables.documentsBalanced(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 1024).as("txt"))
          .select(col("doc_id"), col("txt"),
            (length(col("txt")) - graft.functions.Winnow.K + 1).as("n"))
          .filter(col("n") >= graft.functions.Winnow.W)
        graft.functions.Winnow.withSel(base)
          .withColumn("hs", expr("transform(sel, key -> key div 2048)"))
          .select(col("doc_id"),
            size(col("hs")).cast("long").as("n_fp"),
            expr("aggregate(hs, cast(0 as bigint), (a, x) -> a + x)")
              .as("sum_fp"),
            array_min(col("hs")).as("min_fp"),
            array_max(col("hs")).as("max_fp"))
          .orderBy("doc_id")
      },
      s"""WITH d0 AS (
        |  SELECT doc_id, substr(text, 1, 1024) AS txt FROM documents),
        |d1 AS (
        |  SELECT doc_id, txt, (length(txt) - 8 + 1) AS n
        |  FROM d0 WHERE (length(txt) - 8 + 1) >= 4),
        |${graft.functions.Winnow.selSqlCtes("d1")},
        |hs AS (
        |  SELECT doc_id, list_transform(sel, key -> key // 2048) AS hs
        |  FROM fp)
        |SELECT doc_id, len(hs)::BIGINT AS n_fp,
        |  list_sum(hs)::BIGINT AS sum_fp,
        |  list_min(hs) AS min_fp, list_max(hs) AS max_fp
        |FROM hs ORDER BY doc_id""".stripMargin),

    // WET-style HTML→text extraction — the first operator of every web
    // corpus (Common Crawl WARC→WET) pipeline: drop script/style
    // subtrees, strip tags, collapse whitespace, report the text-to-
    // markup ratio. The corpus has no raw HTML column, so the page is
    // CONSTRUCTED deterministically around each document's text (same
    // concat on both engines) — the extraction operators under test
    // (dotall non-greedy block removal, tag strip, whitespace
    // normalize) are the real thing and the md5 round-trip pins their
    // output exactly. Pure projection: map-only at any scale, no
    // shuffle, regexes run in whole-stage codegen.
    QueryDef("q_text_extract_html",
      (s, d) => {
        val html = concat(
          lit("<html><head><title>t</title><script type=\"text/javascript\">var x = 1 < 2;</script>" +
            "<style>.a { color: red; }</style></head><body><h1 class=\"hd\">"),
          substring(col("text"), 1, 40),
          lit("</h1>\n<p>"), col("text"),
          lit("</p>\n<div class=\"footer\">&copy; footer</div></body></html>"))
        val noBlocks = regexp_replace(html,
          "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
        val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
        val clean = trim(regexp_replace(noTags, "\\s+", " "))
        Tables.documents(s, d)
          .select(col("doc_id"), html.as("html"), clean.as("clean"))
          .select(col("doc_id"), md5(col("clean").cast("binary")).as("text_md5"),
            length(col("clean")).cast("long").as("text_len"),
            (length(col("clean")).cast("double") /
              length(col("html")).cast("double")).as("text_ratio"))
          .orderBy("doc_id")
      },
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>t</title><script type="text/javascript">var x = 1 < 2;</script>'
        |    || '<style>.a { color: red; }</style></head><body><h1 class="hd">'
        |    || substr(text, 1, 40) || '</h1>' || chr(10) || '<p>' || text
        |    || '</p>' || chr(10)
        |    || '<div class="footer">&copy; footer</div></body></html>' AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(html, '<(script|style)[^>]*>.*?</(script|style)>',
        |          ' ', 'gs'),
        |        '<[^>]*>', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, md5(clean) AS text_md5,
        |  length(clean)::BIGINT AS text_len,
        |  length(clean)::DOUBLE / length(html)::DOUBLE AS text_ratio
        |FROM c ORDER BY doc_id""".stripMargin),

    // Top principal component by power iteration — the canonical
    // distributed-PCA split: ONE distributed pass builds the exact
    // d×d covariance (the q_emb_covariance Gramian — shuffle volume
    // #partitions × d²/2, independent of N), then the O(d²) iteration
    // runs on the DRIVER over that bounded model state (the kmeans/PQ
    // collect discipline: K×dims, never corpus rows). 30 iterations,
    // ones start vector, re-normalized each step; the eigenvalue is
    // the final ‖Cv‖ (C is PSD so the dominant eigenvalue is ≥ 0).
    //
    // Determinism: the collected cov entries are the hash-verified
    // q_emb_covariance doubles; every driver-side fold seeds with the
    // FIRST term and accumulates in ascending index order, exactly
    // matching the oracle's list_reduce left fold — so 30 iterations
    // stay bit-identical to DuckDB's recursive CTE.
    QueryDef("q_emb_pca_power",
      (s, d) => {
        val (v, nrm) = topComponent(s, d)
        s.createDataFrame(v.indices.map(i => (i.toLong, v(i), nrm)))
          .toDF("dim", "loading", "eigenvalue")
          .orderBy("dim")
      },
      pcaCtePrefix + "\n" +
        """SELECT u AS dim, v[u + 1] AS loading, nrm AS eigenvalue
          |FROM (SELECT v, nrm FROM it WHERE k = 30), unnest(range(len(v))) AS t(u)
          |ORDER BY dim""".stripMargin),

    // "All-but-the-top" embedding post-processing (Mu & Viswanath,
    // ICLR'18): subtract each vector's projection onto the dominant
    // principal component — the standard isotropy fix before cosine
    // retrieval. The component comes from [[topComponent]] (one
    // distributed Gramian pass + bounded driver solve) and enters the
    // plan as a LITERAL array, so the apply side is a pure map-only
    // projection — no shuffle, no second pass over the corpus. Dot
    // products and norms use the [[graft.functions.Similarity]]
    // 0.0-seeded left fold the oracle mirrors via list_prepend.
    QueryDef("q_emb_residual",
      (s, d) => {
        val (u, _) = topComponent(s, d)
        val uLit = array(u.map(lit): _*)
        val proj = graft.functions.Similarity.dot(col("embedding"), uLit)
        // Lane-per-row output (not a raw array column): the driver's
        // compare row-sorts every column and can't sort array cells.
        Tables.embeddings(s, d)
          .withColumn("proj", proj)
          .withColumn("resid",
            zip_with(col("embedding"), uLit,
              (x, w) => x.cast("double") - col("proj") * w))
          .select(col("vec_id"), col("proj"),
            graft.functions.Similarity.norm(col("resid")).as("norm_after"),
            posexplode(col("resid")).as(Seq("dim", "r")))
          .select(col("vec_id"), col("proj"), col("norm_after"),
            col("dim").cast("long").as("dim"), col("r"))
          .orderBy("vec_id", "dim")
      },
      pcaCtePrefix + ",\n" +
        s"""u AS (SELECT v FROM it WHERE k = 30),
          |pr AS (
          |  SELECT vec_id, embedding,
          |    ${graft.functions.Similarity.dotSql("embedding", "v")} AS proj
          |  FROM embeddings, u),
          |rs AS (
          |  SELECT vec_id, proj,
          |    list_transform(range(len(embedding)),
          |      i -> embedding[i+1]::DOUBLE - proj * v[i+1]) AS resid
          |  FROM pr, u)
          |SELECT vec_id, proj,
          |  sqrt(${graft.functions.Similarity.dotSql("resid", "resid")}) AS norm_after,
          |  d AS dim, resid[d + 1] AS r
          |FROM rs, unnest(range(len(resid))) AS t(d)
          |ORDER BY vec_id, dim""".stripMargin),

    // Zipf-law fit — OLS slope of ln(freq) on ln(rank) over the top-256
    // vocabulary head, the classic corpus-health statistic (natural
    // text slopes ≈ −1; templated/spammy corpora flatten or steepen).
    // Scale shape: the ONLY corpus-scaled work is the token count
    // (reduce-to-vocab, Heaps-sublinear output); the global rank is a
    // vocab-bounded single sort (the q_text_bpe_train discipline) and
    // the regression runs over one 256-point array. Determinism: ln via
    // LnIeee, points rank-sorted, each Σ a 0.0-seeded ascending fold
    // (the q_text_entropy recipe), slope/intercept ONE shared IEEE
    // expression over those sums.
    QueryDef("q_text_zipf",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        import org.apache.spark.sql.expressions.Window
        val vocab = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
        val ranked = vocab
          .withColumn("rank",
            row_number().over(Window.orderBy(col("cnt").desc, col("word").asc)))
          .filter(col("rank") <= 256)
          .select(col("rank"),
            call_function("ln_ieee", col("rank").cast("double")).as("x"),
            call_function("ln_ieee", col("cnt").cast("double")).as("y"))
        def fold(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          aggregate(transform(col("pts"), f), lit(0.0), (a, x) => a + x)
        ranked
          .agg(count(lit(1)).as("n"),
            array_sort(collect_list(struct(col("rank"), col("x"), col("y"))))
              .as("pts"))
          .select(col("n").cast("double").as("nd"), col("n"),
            fold(e => e.getField("x")).as("sx"),
            fold(e => e.getField("y")).as("sy"),
            fold(e => e.getField("x") * e.getField("y")).as("sxy"),
            fold(e => e.getField("x") * e.getField("x")).as("sxx"))
          .withColumn("zipf_slope",
            (col("nd") * col("sxy") - col("sx") * col("sy")) /
              (col("nd") * col("sxx") - col("sx") * col("sx")))
          .select(col("n"), col("zipf_slope"),
            ((col("sy") - col("zipf_slope") * col("sx")) / col("nd"))
              .as("intercept"))
      },
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |v AS (SELECT word, count(*) AS cnt FROM t GROUP BY 1),
        |r AS (SELECT word, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank
        |      FROM v),
        |p AS (SELECT rank, ln(rank::DOUBLE) AS x, ln(cnt::DOUBLE) AS y
        |      FROM r WHERE rank <= 256),
        |a AS (SELECT count(*) AS n, count(*)::DOUBLE AS nd,
        |        list(struct_pack(rank := rank, x := x, y := y)
        |          ORDER BY rank) AS pts
        |      FROM p),
        |f AS (SELECT n, nd,
        |  list_reduce(list_prepend(0.0,
        |    list_transform(pts, e -> struct_extract(e, 'x'))), (a, b) -> a + b) AS sx,
        |  list_reduce(list_prepend(0.0,
        |    list_transform(pts, e -> struct_extract(e, 'y'))), (a, b) -> a + b) AS sy,
        |  list_reduce(list_prepend(0.0,
        |    list_transform(pts, e -> struct_extract(e, 'x') * struct_extract(e, 'y'))),
        |    (a, b) -> a + b) AS sxy,
        |  list_reduce(list_prepend(0.0,
        |    list_transform(pts, e -> struct_extract(e, 'x') * struct_extract(e, 'x'))),
        |    (a, b) -> a + b) AS sxx
        |  FROM a),
        |sl AS (SELECT *,
        |  (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS zipf_slope FROM f)
        |SELECT n, zipf_slope, (sy - zipf_slope * sx) / nd AS intercept
        |FROM sl""".stripMargin),

    // Compression-ratio quality signal — deflate each document once and
    // report compressed/raw size: the classic cheap boilerplate/spam
    // detector (templated text compresses far below natural prose;
    // Gopher/RefinedWeb-era pipelines threshold on it). The Deflater is
    // PARTITION-LOCAL native state (the multimodal-codec discipline):
    // one instance per partition, reset between rows, `end()` on task
    // completion so early-terminating consumers still release the zlib
    // handle. Rows-only at the gate (no zlib in DuckDB); OpsSpec pins
    // the discriminative contract (repetitive ≪ natural) and run-to-run
    // determinism.
    // ColBERT-style late-interaction retrieval (Khattab & Zaharia
    // SIGIR'20): MaxSim scoring — a "document" is a BAG of token
    // vectors (vec_id div 4 groups four corpus vectors into one
    // multi-vector doc), and score(Q, D) = Σ_{q∈Q} max_{t∈D} cos(q, t).
    // The per-query max rewards the best-matching token instead of
    // averaging it away — the property that makes late interaction
    // beat single-vector retrieval on long documents.
    //
    // Scale shape: the query side is TWO vectors broadcast to every
    // token row; per-(doc, query) max and per-doc sum are both
    // map-side-combined aggregates; top-10 is TakeOrdered. At corpus
    // scale the crossJoin-with-2 is a constant fan-out, not a join
    // explosion, and the ANN family's bucketing composes in front of
    // it unchanged. Determinism: cosine via the native expression
    // (bit-compatible with the HOF/oracle contract), max is exact, and
    // the final Σ adds exactly TWO doubles — IEEE addition commutes,
    // so aggregation order cannot move the hash.
    QueryDef("q_similarity_maxsim",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 2)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val toks = e.select(expr("vec_id div 4").as("mdoc_id"),
          col("vec_id"), col("embedding"))
        toks.crossJoin(broadcast(q))
          .select(col("mdoc_id"), col("q_id"),
            call_function("cosine_sim", col("embedding"), col("q_emb")).as("sim"))
          .groupBy("mdoc_id", "q_id")
          .agg(max(col("sim")).as("best"))
          .groupBy("mdoc_id")
          .agg(sum(col("best")).as("maxsim"), count(lit(1)).as("n_q"))
          .orderBy(col("maxsim").desc, col("mdoc_id").asc)
          .limit(10)
      },
      s"""WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb
        |  FROM embeddings WHERE vec_id < 2),
        |toks AS (
        |  SELECT (vec_id // 4)::BIGINT AS mdoc_id, vec_id, embedding
        |  FROM embeddings),
        |sims AS (
        |  SELECT mdoc_id, q_id,
        |    ${graft.functions.Similarity.cosineSql("toks.embedding", "q.q_emb")} AS sim
        |  FROM toks, q),
        |best AS (
        |  SELECT mdoc_id, q_id, max(sim) AS best
        |  FROM sims GROUP BY 1, 2)
        |SELECT mdoc_id, sum(best) AS maxsim, count(*) AS n_q
        |FROM best GROUP BY mdoc_id
        |ORDER BY maxsim DESC, mdoc_id ASC LIMIT 10""".stripMargin),

    // Deflate compression-ratio profiling (the entropy/quality signal
    // of Gopher-style corpus filtering). zlib has no DuckDB mirror, so
    // the per-doc ratios can't hash-match — the query emits its
    // CALIBRATION instead: per 128-char length band, the exact doc
    // count and char mass (SQL-mirrored) plus booleans pinning every
    // doc's codec contract — n_deflate within (8, n_raw+11] (the zlib
    // stored-block bound) and ratio inside (0.2, 1.3) (observed
    // 0.38–1.13 across SFs — tiny docs can expand past 1.0). The oracle states the exact side and
    // pins the booleans TRUE, so a codec or plumbing regression now
    // fails the driver gate; per-doc values stay covered by
    // Round9cSpec's planted-contract pins.
    QueryDef("q_text_compression",
      (s, d) => {
        deflateStats(Tables.documents(s, d).select(col("doc_id"), col("text")))
          .withColumn("band", expr("n_chars_len div 128"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars_len")).as("sum_chars"),
            (min(col("ratio")) > 0.2 && max(col("ratio")) < 1.3)
              .as("ratio_in_range"),
            (max(col("n_deflate") - col("n_raw")) <= 11L &&
              min(col("n_deflate")) >= 8L).as("deflate_bounded"))
          .orderBy("band")
      },
      """SELECT (length(text) // 128)::BIGINT AS band,
           count(*)::BIGINT AS n_docs,
           sum(length(text))::BIGINT AS sum_chars,
           true AS ratio_in_range, true AS deflate_bounded
         FROM documents GROUP BY band ORDER BY band"""),
  )
}
