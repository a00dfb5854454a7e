package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Streaming incremental dedup — the production loop a 100 TB ingest runs:
  * documents stream in, each micro-batch is verdict-ed against a standing
  * DIGEST store (never the documents), and the batch's kept digests are
  * appended back to the store. Expressed as `foreachBatch` over the SAME
  * `Dedup.incrementalVerdicts` the batch query uses, with a parquet digest
  * store standing in for the production KV/Delta table — so stream and
  * batch replay are the same code path by construction, and this spec
  * proves the cross-batch STATE handling (store append + restart safety)
  * gives verdicts identical to replaying the batches by hand.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def digests(df: DataFrame): DataFrame =
    df.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))

  test("foreachBatch incremental dedup == hand-replayed batches, across restart") {
    val in = Files.createTempDirectory("sdedup-in").toString
    val store = Files.createTempDirectory("sdedup-store").toString + "/digests"
    val verdicts = Files.createTempDirectory("sdedup-out").toString + "/verdicts"
    val cp = Files.createTempDirectory("sdedup-cp").toString

    // seed the standing corpus: "bbb" is already accepted
    digests(Seq((100L, "bbb already in the corpus")).toDF("doc_id", "text"))
      .select("h").write.mode(SaveMode.Overwrite).parquet(store)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = digests(batch).localCheckpoint() // one evaluation, 3 consumers
          val out = Dedup.incrementalVerdicts(b, spark.read.parquet(store))
            .localCheckpoint() // verdicts must not re-read a mutated store
          out.write.mode(SaveMode.Append).parquet(verdicts)
          out.filter(col("verdict") === "keep").select(col("content_md5").as("h"))
            .write.mode(SaveMode.Append).parquet(store)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // file-source contract: files must sit directly in `in` — write each
    // batch to a scratch dir and move its part file in under a new name
    def arrive(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("sdedup-tmp").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(in, s"$name.parquet"))
    }

    // batch 1: an intra-batch dup, a corpus dup, and a genuine keep
    arrive("b1", Seq((1L, "aaa fresh today"), (2L, "aaa fresh today"),
      (3L, "bbb already in the corpus")))
    runOnce()

    // batch 2 AFTER a stream restart: "aaa" was kept by batch 1, so doc 4
    // must now be dup_corpus — state lives in the store, not the query
    arrive("b2", Seq((4L, "aaa fresh today"), (5L, "ccc never seen")))
    runOnce()

    val got = spark.read.parquet(verdicts)
      .select("doc_id", "verdict").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(
      1L -> "keep", 2L -> "dup_batch", 3L -> "dup_corpus",
      4L -> "dup_corpus", 5L -> "keep"))

    // replaying nothing new must not duplicate verdicts (exactly-once)
    runOnce()
    assert(spark.read.parquet(verdicts).count() == 5)

    // hand replay: the same op over the same two batches gives the same
    // verdicts — stream adds only the store plumbing, not semantics
    val seed = digests(Seq((100L, "bbb already in the corpus")).toDF("doc_id", "text")).select("h")
    val b1 = digests(Seq((1L, "aaa fresh today"), (2L, "aaa fresh today"),
      (3L, "bbb already in the corpus")).toDF("doc_id", "text"))
    val v1 = Dedup.incrementalVerdicts(b1, seed)
    val corpus2 = seed.unionAll(
      v1.filter(col("verdict") === "keep").select(col("content_md5").as("h")))
    val b2 = digests(Seq((4L, "aaa fresh today"), (5L, "ccc never seen"))
      .toDF("doc_id", "text"))
    val replay = v1.unionAll(Dedup.incrementalVerdicts(b2, corpus2))
      .select("doc_id", "verdict").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(replay == got)
  }

  test("streaming url dedup: canonical store == hand-computed merge, across restart") {
    // The streaming twin of q_dedup_url: raw URLs stream in, each batch
    // canonicalizes ([[graft.functions.UrlCanon]] — the same expression
    // the batch query compiles) and MERGES into a standing
    // (canonical_url, n_raw, keep_key) store: counts add, keep_key takes
    // the min. The store never holds raw variants — the 100 TB point.
    val in = Files.createTempDirectory("surl-in").toString
    val store = Files.createTempDirectory("surl-store").toString + "/canon"
    val cp = Files.createTempDirectory("surl-cp").toString

    Seq.empty[(String, Long, Long)].toDF("canonical_url", "n_raw", "keep_key")
      .write.mode(SaveMode.Overwrite).parquet(store)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("url_id LONG, raw_url STRING")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.select(col("url_id"),
              graft.functions.UrlCanon.canonicalize(col("raw_url")).as("canonical_url"))
            .groupBy("canonical_url")
            .agg(count(lit(1)).as("n_raw"), min("url_id").as("keep_key"))
          val merged = b.join(
              spark.read.parquet(store)
                .withColumnRenamed("n_raw", "s_n").withColumnRenamed("keep_key", "s_k"),
              Seq("canonical_url"), "full")
            .select(col("canonical_url"),
              (coalesce(col("n_raw"), lit(0L)) + coalesce(col("s_n"), lit(0L))).as("n_raw"),
              least(coalesce(col("keep_key"), col("s_k")),
                coalesce(col("s_k"), col("keep_key"))).as("keep_key"))
            .localCheckpoint() // materialize BEFORE overwriting what it reads
          merged.write.mode(SaveMode.Overwrite).parquet(store)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def arrive(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("surl-tmp").toString
      rows.toDF("url_id", "raw_url").coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(in, s"$name.parquet"))
    }

    // batch 1: host-case + trailing-slash variants of /p/1, a utm-only query
    arrive("b1", Seq(
      (1L, "https://Example.COM/p/1/"),
      (2L, "https://example.com/p/1"),
      (3L, "https://example.com/p/2?utm_source=a1")))
    runOnce()
    // batch 2 AFTER a restart: a fragment variant of /p/1 (must merge into
    // the standing entry — state lives in the store) and a real query
    arrive("b2", Seq(
      (4L, "https://example.com/p/1#frag"),
      (5L, "https://example.com/p/3?id=7")))
    runOnce()

    val got = spark.read.parquet(store).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "https://example.com/p/1" -> ((3L, 1L)),
      "https://example.com/p/2" -> ((1L, 3L)),
      "https://example.com/p/3?id=7" -> ((1L, 5L))), s"got $got")
  }
}
