package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Round-17 streaming twin for the dedup-registry erasure path
  * (q_dedup_canonical_delete's production loop): erasure batches
  * (doc_ids to forget) arrive on a stream; foreachBatch drops them
  * from the standing members store (digest, doc_id) and the canonical
  * registry is the min-member view of what survives. The
  * StreamingHnswSpec discipline applied to the dedup store:
  *   1. two erasure batches absorbed across a STREAM RESTART leave
  *      the same store as hand-replaying the same deletes;
  *   2. re-election is visible through the registry view (a group
  *      whose canonical was erased shows a new, larger canonical);
  *   3. replaying an already-applied batch is a content no-op (the
  *      at-least-once-with-idempotent-store contract — an anti-join
  *      of ids that are already gone deletes nothing).
  */
class Round17Spec7 extends SparkSpec {

  private def members(df: DataFrame): Set[(String, Long)] =
    df.select("h", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("streamed erasure batches == hand-replayed deletes, across restart; re-election visible") {
    val in = Files.createTempDirectory("sdedup-in").toString
    val store = Files.createTempDirectory("sdedup-store").toString + "/members"
    val cp = Files.createTempDirectory("sdedup-cp").toString

    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      md5(concat_ws(" ", sort_array(array_distinct(split(col("text"), " "))))
        .cast("binary")).as("h"))
      .localCheckpoint(eager = true)

    // seed the standing members store
    docs.write.mode(SaveMode.Overwrite).parquet(store)

    // erasure arrives in two batches: % 14 == 3, then % 14 == 10
    // (union == the registered query's % 7 == 3 erasure set)
    val t1 = docs.filter(col("doc_id") % 14 === 3).select("doc_id")
    val t2 = docs.filter(col("doc_id") % 14 === 10).select("doc_id")

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val survivors = spark.read.parquet(store)
            .join(batch.localCheckpoint(), Seq("doc_id"), "left_anti")
            .localCheckpoint(eager = true)
          survivors.write.mode(SaveMode.Overwrite).parquet(store)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def arrive(name: String, rows: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("sdedup-tmp").toString
      rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(in, s"$name.parquet"))
    }

    val registryBefore = docs.groupBy("h").agg(min("doc_id").as("canon"))

    arrive("t1", t1)
    runOnce()
    // batch 2 AFTER a stream restart: state comes back from the store
    arrive("t2", t2)
    runOnce()

    // hand replay over the same seed
    val hand = docs
      .join(t1, Seq("doc_id"), "left_anti")
      .join(t2, Seq("doc_id"), "left_anti")
    assert(members(spark.read.parquet(store)) == members(hand),
      "streamed store differs from hand-replayed erasure")

    // re-election visible: some group's canonical changed to a LARGER id
    val registryAfter = spark.read.parquet(store)
      .groupBy("h").agg(min("doc_id").as("canon2"))
    val reelected = registryBefore.join(registryAfter, "h")
      .filter(col("canon2") > col("canon")).count()
    assert(reelected > 0, "no group re-elected a canonical — erasure split lost the interesting case")

    // idempotent: replaying batch 2's content deletes nothing
    val before = members(spark.read.parquet(store))
    arrive("t2again", t2)
    runOnce()
    assert(members(spark.read.parquet(store)) == before,
      "replayed erasure batch changed the store")
  }
}
