package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Regression pin for the short-document n-gram guards (round-3 hardening,
  * re-flagged by the round-5 verdict): `sequence(1, size(ws) - k)` on a
  * sub-n-gram document yields a DESCENDING sequence through index 0, and
  * `element_at(ws, 0)` throws INVALID_INDEX_OF_ZERO. The shipped fixture
  * corpus guarantees ≥10 words per doc, so the only way to prove the
  * guards hold is a corpus that does NOT: this spec writes a documents
  * table of 0/1/2/3-word docs and runs every registered query that builds
  * word n-grams over `documents`. A regression reintroduces the throw.
  */
class ShortDocSpec extends SparkSpec {
  import spark.implicits._

  private lazy val shortDir: String = {
    val dir = Files.createTempDirectory("graft-shortdoc").toString
    Seq(
      (1L, "", "en", "web"),
      (2L, "one", "en", "web"),
      (3L, "two words", "en", "book"),
      (4L, "exactly three words", "en", "book"),
      (5L, "a full five word doc", "en", "web"),
      // benchmark-side rows for q_decontaminate (doc_id < 20 is the
      // stand-in eval set) need ≥1 trigram to exercise the join
      (6L, "shared trigram lives here today", "en", "web"),
      (25L, "shared trigram lives elsewhere entirely", "en", "web"),
      (26L, "no overlap in this training doc", "en", "book"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val ngramQueries = Seq(
    "q_decontaminate",      // trigrams (LlmOps2)
    "q_text_jaccard",       // bigrams (LlmOps)
    "q_dedup_minhash_ngram", // bigram shingles (LlmOps)
    "q_vocab_ngrams",       // uni+bigrams (LlmOps3)
    "q_dedup_paragraph",    // derived chunks (LlmOps3)
    "q_text_repetition",    // bigram mode + chunk fractions (LlmOps3)
    "q_text_chargram",      // 5-char grams with greatest() guard (LlmOps)
    "q_text_fingerprint",   // rolling hash (LlmOps)
    "q_dedup_substring",    // 8-token windows with size guard (LlmOps3)
    "q_dedup_substring_spans", // same windows + islands rollup (LlmOps3)
    "q_scrub_boilerplate")  // derived chunks (LlmOps3)

  ngramQueries.foreach { name =>
    test(s"$name survives sub-n-gram documents (0/1/2-word)") {
      assert(SparkEntry.queries.contains(name), s"$name not registered")
      // must not throw; row count sanity only (semantics pinned elsewhere)
      val n = SparkEntry.queries(name)(spark, shortDir).count()
      assert(n >= 0)
    }
  }

  test("q_decontaminate still flags the genuinely shared trigram") {
    val got = SparkEntry.queries("q_decontaminate")(spark, shortDir).collect()
    val flagged = got.map(r => r.getAs[Long]("doc_id")).toSet
    assert(flagged == Set(25L), s"expected only doc 25 flagged, got $flagged")
  }
}
