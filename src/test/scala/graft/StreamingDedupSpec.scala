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
}
