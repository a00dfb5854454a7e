package graft

import org.apache.spark.sql.functions._

import graft.etl.AlbLogParser
import graft.ops.Multimodal

/** Property-style pinning of the reference cast semantics and engine
  * invariants over seeded random corpora (SURVEY §5.2:
  * "∀ s: to_int(s) == 0 ∨ s matches ^[0-9]+$"). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randomStrings(n: Int): Seq[String] = {
    val edge = Seq("-", "", "-1", "1e3", "  12  ", "0.5", ".5", "+7", "nan",
      "NaN", "inf", "0", "007", "9" * 12, "1.2.3", "--1", "1-")
    val rand = Seq.fill(n) {
      val len = rnd.nextInt(8)
      val alphabet = rnd.nextInt(3) match {
        case 0 => "0123456789"
        case 1 => "0123456789.-+eE"
        case _ => "abc 0123456789.-+"
      }
      Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    edge ++ rand
  }

  private val floatRe =
    "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  test("to_int: nonzero only for pure digit strings (reference :43-44)") {
    val ss = randomStrings(300)
    val got = ss.toDF("v").select(AlbLogParser.guardedInt(col("v"))).collect()
    got.zip(ss).foreach { case (r, s) =>
      val digits = s.nonEmpty && s.forall(_.isDigit)
      if (!digits) assert(r.getInt(0) == 0, s"input '$s'")
      else if (s.length <= 9) assert(r.getInt(0) == s.toInt, s"input '$s'")
    }
  }

  test("to_float: failures map to 0.0, valid decimals parse (reference :46-50)") {
    val ss = randomStrings(300)
    val got = ss.toDF("v").select(AlbLogParser.guardedDouble(col("v"))).collect()
    got.zip(ss).foreach { case (r, s) =>
      val expected = if (s.matches(floatRe)) s.toDouble else 0.0
      assert(r.getDouble(0) == expected, s"input '$s'")
    }
  }

  test("rolling hash: expression == plain JVM fold for arbitrary ASCII text") {
    val texts = Seq.fill(100) {
      val len = 1 + rnd.nextInt(60)
      Seq.fill(len)((32 + rnd.nextInt(95)).toChar).mkString
    }
    def jvmHash(bytes: Array[Byte]): Long =
      bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 4294967296L)
    val got = texts.toDF("text")
      .select(graft.ops.TextAnalysis.rollingHash(col("text"))).collect()
    got.zip(texts).foreach { case (r, s) =>
      assert(r.getLong(0) == jvmHash(s.getBytes("UTF-8")), s"input '$s'")
    }
  }

  test("cosine expression == HOF fold, bit-exact, on random vectors") {
    val vecs = Seq.fill(50)((
      Array.fill(16)(rnd.nextFloat() - 0.5f),
      Array.fill(16)(rnd.nextFloat() - 0.5f)))
    graft.functions.CosineSimExpr.register(spark)
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      call_function("cosine_sim", col("a"), col("b")).as("native"),
      graft.functions.Similarity.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("sorted_intersect_size == array_intersect size on random word sets") {
    graft.functions.SortedIntersectSize.register(spark)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val sets = Seq.fill(80)((
      rnd.shuffle(vocab).take(1 + rnd.nextInt(7)).sorted.toArray,
      rnd.shuffle(vocab).take(1 + rnd.nextInt(7)).sorted.toArray))
    val rows = sets.toDF("a", "b").select(
      call_function("sorted_intersect_size", col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("intervalOverlapJoin == naive overlap predicate join, across widths") {
    // exactness of the bucket-grid decomposition: for random closed
    // intervals and several grid widths (including widths far from the
    // typical interval length), the equi-bucketed join must produce the
    // identical multiset of pairs as the naive O(L·R) predicate join —
    // each pair exactly once (first-shared-bucket rule), duplicates in
    // the INPUT preserved.
    val ls = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(120)) }
    val rs = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(40)) }
    val left = ls.toDF("lid", "ls", "le")
    val right = rs.toDF("rid", "rs", "re")
    val naive = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    for (width <- Seq(7L, 50L, 300L, 5000L)) {
      val bucketed = graft.ops.Joins.intervalOverlapJoin(
          left, right, Seq.empty, "ls", "le", "rs", "re", width)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(bucketed == naive, s"width=$width: bucket join diverged " +
        s"(${bucketed.size} vs ${naive.size} pairs)")
    }
  }

  test("paragraphDedup is idempotent and token-conserving") {
    // running dedup on its own output changes nothing (every surviving
    // paragraph instance is already the globally-first of its content),
    // and the surviving paragraph count equals the number of DISTINCT
    // paragraphs in the input.
    val texts = Seq.tabulate(40) { i =>
      val paras = Seq.fill(1 + rnd.nextInt(4))(
        Seq.fill(3)(s"w${rnd.nextInt(6)}").mkString(" "))
      (i.toLong, paras.mkString("\n\n"))
    }
    val df = texts.toDF("doc_id", "text")
    val once = graft.ops.Dedup.paragraphDedup(df, "doc_id", "text")
    val onceRows = once.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val twice = graft.ops.Dedup.paragraphDedup(
        once.select(col("doc_id"), col("text_clean").as("text")), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(twice == onceRows, "paragraphDedup must be idempotent")
    val distinctParas = texts.flatMap(_._2.split("\n\n")).distinct.size
    assert(onceRows.map(_._3).sum == distinctParas.toLong,
      "survivors must equal distinct paragraph count")
  }

  test("boilerplateScrub is idempotent and removal-exact on random corpora") {
    // Every copy of an over-threshold paragraph is gone after one pass, so
    // every surviving paragraph's doc frequency is already under the
    // threshold — a second pass must be a no-op. Survivor totals equal the
    // per-doc count of under-threshold paragraph instances, computed
    // independently in plain Scala.
    val maxDocs = 2
    val texts = Seq.tabulate(40) { i =>
      val paras = Seq.fill(1 + rnd.nextInt(4))(
        Seq.fill(3)(s"w${rnd.nextInt(6)}").mkString(" "))
      (i.toLong, paras.mkString("\n\n"))
    }
    val freq = texts.flatMap { case (id, t) => t.split("\n\n").distinct.map((_, id)) }
      .groupBy(_._1).map { case (p, xs) => (p, xs.size) }
    val expected = texts.map { case (id, t) =>
      (id, t.split("\n\n").count(p => freq(p) < maxDocs))
    }.filter(_._2 > 0).toMap
    val df = texts.toDF("doc_id", "text")
    val once = graft.ops.Dedup.boilerplateScrub(df, "doc_id", "text", maxDocs)
    val onceRows = once.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(onceRows.map(r => (r._1, r._3.toInt)).toMap == expected,
      "survivor counts must match the plain-Scala frequency computation")
    val twice = graft.ops.Dedup.boilerplateScrub(
        once.select(col("doc_id"), col("text_clean").as("text")),
        "doc_id", "text", maxDocs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(twice == onceRows, "boilerplateScrub must be idempotent")
  }

  test("incrementalVerdicts partitions every batch row into exactly one verdict") {
    // Laws over a random batch/corpus mix: every batch row gets exactly
    // one verdict; keep rows have distinct digests disjoint from the
    // corpus; dup_corpus rows' digests are all in the corpus; dup_batch
    // rows share a digest with a smaller-id keep row of the same batch.
    val pool = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    val batch = (1L to 30L).map(i => (i, pool(rnd.nextInt(pool.size))))
    val corpusTexts = Seq.fill(3)(pool(rnd.nextInt(pool.size))).distinct
    val b = batch.toDF("doc_id", "h")
    val c = corpusTexts.toDF("h")
    val got = graft.ops.Dedup.incrementalVerdicts(b, c).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length == batch.size, "one verdict per batch row")
    val byVerdict = got.groupBy(_._3).withDefaultValue(Array.empty)
    assert(byVerdict("dup_corpus").forall(r => corpusTexts.contains(r._2)))
    assert(byVerdict("keep").forall(r => !corpusTexts.contains(r._2)))
    assert(byVerdict("keep").map(_._2).distinct.length == byVerdict("keep").length,
      "keeps must be digest-distinct")
    val keepIds = byVerdict("keep").map(r => r._2 -> r._1).toMap
    assert(byVerdict("dup_batch").forall(r => keepIds.get(r._2).exists(_ < r._1)),
      "every dup_batch row must trail a smaller-id keep of the same digest")
  }

  test("url canonicalization is idempotent and rule-complete on fuzzed urls") {
    // The invariant that makes a canonical form a JOIN KEY: applying the
    // canonicalizer to its own output must be a fixpoint (otherwise two
    // pipeline stages that canonicalize at different depths disagree).
    // Fuzz over every combination the rules touch: host case, trailing
    // slash, utm-only vs real vs mixed-position queries, fragments.
    val hosts = Seq("example.com", "Example.COM", "EXAMPLE.com", "cdn.Example.org")
    val paths = Seq("", "/", "/a", "/a/", "/a/b", "/a/b/")
    val queries = Seq("", "?utm_source=x", "?id=1", "?id=1&utm_medium=y")
    val frags = Seq("", "#x", "#sec/with/slash")
    val urls = for (h <- hosts; p <- paths; q <- queries; f <- frags)
      yield s"https://$h$p$q$f"
    val canon = graft.functions.UrlCanon.canonicalize(col("u"))
    val once = urls.toDF("u").select(canon.as("c1")).collect().map(_.getString(0))
    val twice = once.toSeq.toDF("u").select(canon.as("c2")).collect().map(_.getString(0))
    once.zip(twice).zip(urls).foreach { case ((c1, c2), raw) =>
      assert(c1 == c2, s"not idempotent on '$raw': '$c1' -> '$c2'")
      assert(!c1.contains("#"), s"fragment survived: '$raw' -> '$c1'")
      assert(!c1.endsWith("/"), s"trailing slash survived: '$raw' -> '$c1'")
      val hostOut = c1.stripPrefix("https://").takeWhile(_ != '/').takeWhile(_ != '?')
      assert(hostOut == hostOut.toLowerCase, s"host case survived: '$c1'")
    }
  }

  test("BPE space-doubling merge == reference greedy left-to-right merge") {
    // q_text_bpe_train applies merges via `replace` on a space-doubled
    // symbol string. The contract: identical to the canonical greedy
    // non-overlapping left-to-right merge — including the adversarial
    // shapes (consecutive occurrences "a b a b", self-pairs "a a a",
    // pair straddles "b a b a b"). Fuzzed over random symbol strings
    // from a 3-letter alphabet, every possible merge pair applied.
    def refMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val rng = new scala.util.Random(9)
    val cases = (1 to 300).map { _ =>
      val syms = Vector.fill(1 + rng.nextInt(10))(("a" + rng.nextInt(3)).intern())
      val pair = s"a${rng.nextInt(3)} a${rng.nextInt(3)}"
      (syms.mkString(" "), pair)
    } ++ Seq( // pinned adversarial shapes
      ("a0 a1 a0 a1", "a0 a1"), ("a0 a0 a0", "a0 a0"),
      ("a1 a0 a1 a0 a1", "a0 a1"), ("a0", "a0 a0"))
    val df = cases.toDF("sym", "bp")
    val got = df.withColumn("merged",
        graft.queries.LlmOps8.mergeExpr(col("sym"), col("bp")))
      .collect()
    got.foreach { r =>
      val Array(a, b) = r.getAs[String]("bp").split(" ")
      val expected = refMerge(
        r.getAs[String]("sym").split(" ").toVector, a, b).mkString(" ")
      assert(r.getAs[String]("merged") == expected,
        s"sym='${r.getAs[String]("sym")}' pair='${r.getAs[String]("bp")}'")
    }
  }
}
