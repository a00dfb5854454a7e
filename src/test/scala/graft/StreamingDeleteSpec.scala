package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.streaming.DeleteStreams

/** Streaming delete propagation — the q_delete_propagate twin run as a
  * tombstone feed (`foreachBatch` over [[DeleteStreams.applyTombstones]])
  * against standing parquet stores, restart-proven: after two tombstone
  * micro-batches with a stream restart between them, the repaired
  * summary store equals the REBUILD from the purged corpus (the same
  * repair == rebuild contract DeletePropagateSpec pins for the batch
  * query), and replaying an empty feed changes nothing (exactly-once).
  */
class StreamingDeleteSpec extends SparkSpec {
  import spark.implicits._

  // deterministic toy corpus: digest groups with planted duplicates
  //   h("aaa") group: docs 3, 5, 9   (keeper 3)
  //   h("bbb") group: docs 4, 8      (keeper 4)
  //   h("ccc") group: doc 7          (keeper 7)
  private val corpus = Seq(
    (3L, "aaa"), (5L, "aaa"), (9L, "aaa"),
    (4L, "bbb"), (8L, "bbb"),
    (7L, "ccc"))

  private def digests(df: DataFrame): DataFrame =
    df.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))

  private def overwrite(df: DataFrame, path: String): Unit =
    // eager checkpoint BEFORE overwriting the path the frame reads from
    df.localCheckpoint(eager = true).write.mode(SaveMode.Overwrite).parquet(path)

  test("foreachBatch tombstone repair == rebuild from purged corpus, across restart") {
    val in = Files.createTempDirectory("sdel-in").toString
    val membersP = Files.createTempDirectory("sdel-m").toString + "/members"
    val summaryP = Files.createTempDirectory("sdel-s").toString + "/summary"
    val cp = Files.createTempDirectory("sdel-cp").toString

    // seed the standing stores from the corpus (keeper = min doc_id)
    val docs = digests(corpus.toDF("doc_id", "text"))
    docs.write.mode(SaveMode.Overwrite).parquet(membersP)
    docs.groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
      .write.mode(SaveMode.Overwrite).parquet(summaryP)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val ids = batch.localCheckpoint(eager = true)
          val (m2, s2) = DeleteStreams.applyTombstones(
            ids, spark.read.parquet(membersP), spark.read.parquet(summaryP))
          // materialize BOTH repaired stores before either overwrite:
          // s2 reads members, m2 reads members — a write-then-compute
          // order would repair the summary against mutated members
          val m2c = m2.localCheckpoint(eager = true)
          val s2c = s2.localCheckpoint(eager = true)
          m2c.write.mode(SaveMode.Overwrite).parquet(membersP)
          s2c.write.mode(SaveMode.Overwrite).parquet(summaryP)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def arrive(name: String, ids: Seq[Long]): Unit = {
      val tmp = Files.createTempDirectory("sdel-tmp").toString
      ids.toDF("doc_id").coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(in, s"$name.parquet"))
    }

    // batch 1: kill the "aaa" KEEPER (3) and one "bbb" non-keeper (8)
    //   → aaa re-elects 5, n 3→2; bbb keeps 4, n 2→1
    arrive("t1", Seq(3L, 8L))
    runOnce()
    val afterB1 = spark.read.parquet(summaryP)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hOf = digests(Seq((0L, "aaa"), (0L, "bbb"), (0L, "ccc")).toDF("doc_id", "text"))
      .collect().map(_.getString(1))
    assert(afterB1(hOf(0)) == (2L, 5L), "aaa: keeper died, 5 re-elected")
    assert(afterB1(hOf(1)) == (1L, 4L), "bbb: keeper survives")
    assert(afterB1(hOf(2)) == (1L, 7L), "ccc: untouched")

    // batch 2 AFTER a stream restart: finish off "bbb" (group vanishes),
    // kill the re-elected "aaa" keeper (5 → 9 takes over), and replay an
    // already-dead id (3 — must be a no-op)
    arrive("t2", Seq(4L, 5L, 3L))
    runOnce()

    val gotSummary = spark.read.parquet(summaryP)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val gotMembers = spark.read.parquet(membersP)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // rebuild from the purged corpus: the ground truth the incremental
    // repair must land on exactly
    val deadAll = Set(3L, 8L, 4L, 5L)
    val purged = digests(corpus.filterNot(c => deadAll(c._1)).toDF("doc_id", "text"))
    val rebuilt = purged.groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSummary == rebuilt, "stream-repaired summary == rebuild from purged corpus")
    assert(gotMembers == purged.collect().map(r => (r.getLong(0), r.getString(1))).toSet)

    // exactly-once: re-running with no new tombstone files changes nothing
    runOnce()
    assert(spark.read.parquet(summaryP)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == rebuilt)
  }

  test("applyTombstones is a no-op for unknown or already-deleted ids") {
    val members = digests(corpus.toDF("doc_id", "text"))
    val summary = members.groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
    val (m2, s2) = DeleteStreams.applyTombstones(
      Seq(999L, 1000L).toDF("doc_id"), members, summary)
    assert(m2.count() == members.count())
    assert(s2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      summary.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
