package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ops.HnswIndex

/** Round-17 pins for the ANN delete path:
  *   1. index invariants [[HnswIndex.remove]] must preserve: no edge
  *      touches a tombstone, every degree stays ≤ M_tot, and every
  *      surviving source that lost a neighbor keeps out-links (the
  *      repair actually repaired);
  *   2. remove is idempotent (replaying the tombstone batch is a
  *      content no-op — the at-least-once store contract);
  *   3. recall floor: the repaired index still clears the 0.90
  *      recall@10 bar against brute force over the survivors (read
  *      from the oracle-checked query's own Spark path);
  *   4. streaming twin: tombstone batches absorbed via foreachBatch
  *      across a STREAM RESTART leave the same store as hand-replaying
  *      the same removes (the StreamingHnswSpec discipline applied to
  *      deletes).
  */
class Round17Spec3 extends SparkSpec {

  private def edgeSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("src", "dst", "qs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("remove: tombstones gone, degrees capped, lost sources re-linked, idempotent") {
    graft.functions.CosineSimExpr.register(spark)
    val v = graft.queries.Round15Ops2.leveled(spark, sf)
      .localCheckpoint(eager = true)
    val e0 = HnswIndex.buildE0(v)
    val ts = v.filter(col("vec_id") % 10 === 9).select("vec_id")
      .localCheckpoint(eager = true)
    val (v2, e0d, _, _) = HnswIndex.remove(v, e0, ts)

    assert(v2.count() == v.count() - ts.count(), "survivor count wrong")
    assert(v2.join(ts, Seq("vec_id"), "left_semi").isEmpty,
      "a tombstoned vector survived")

    // no edge endpoint is tombstoned
    val tsSet = ts.collect().map(_.getLong(0)).toSet
    val badEdges = e0d.filter(col("src").isin(tsSet.toSeq: _*) ||
      col("dst").isin(tsSet.toSeq: _*)).count()
    assert(badEdges == 0, s"$badEdges edges still touch tombstones")

    // degree cap preserved through the repair merge
    val mTot = graft.queries.Round15Ops2.MTot(0)
    val maxDeg = e0d.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= mTot, s"out-degree $maxDeg exceeds M_tot $mTot")

    // every surviving source that lost a neighbor still has out-links
    val lostSrc = e0.filter(col("dst").isin(tsSet.toSeq: _*) &&
      !col("src").isin(tsSet.toSeq: _*)).select("src").distinct()
    val relinked = e0d.join(lostSrc, "src").select("src").distinct().count()
    assert(relinked == lostSrc.count(),
      s"only $relinked of ${lostSrc.count()} lost sources kept out-links")

    // idempotent: replaying the tombstone batch is a content no-op
    val (v3, e0r, _, _) = HnswIndex.remove(v2, e0d, ts)
    assert(v3.count() == v2.count(), "replayed delete dropped extra vectors")
    assert(edgeSet(e0r) == edgeSet(e0d), "replayed delete changed the edges")
  }

  test("repaired index clears the recall@10 bar") {
    val df = SparkEntry.queries("q_similarity_hnsw_delete_recall")(spark, sf)
    val rec = df.select(avg(col("recall"))).head().getDouble(0)
    info(s"post-delete recall@10 = $rec")
    assert(rec >= 0.90, s"post-delete recall $rec below the 0.90 bar")
  }

  test("foreachBatch tombstone maintenance == hand-replayed removes, across restart") {
    graft.functions.CosineSimExpr.register(spark)
    val in = Files.createTempDirectory("shnswd-in").toString
    val storeV = Files.createTempDirectory("shnswd-store").toString + "/vectors"
    val storeE = Files.createTempDirectory("shnswd-store").toString + "/edges0"
    val cp = Files.createTempDirectory("shnswd-cp").toString

    val v = graft.queries.Round15Ops2.leveled(spark, sf)
      .localCheckpoint(eager = true)
    // tombstones split into two arriving batches (each 5 %)
    val t1 = v.filter(col("vec_id") % 20 === 9).select("vec_id")
    val t2 = v.filter(col("vec_id") % 20 === 19).select("vec_id")

    // seed the standing store: full corpus + its from-scratch layer 0
    v.write.mode(SaveMode.Overwrite).parquet(storeV)
    HnswIndex.buildE0(v).write.mode(SaveMode.Overwrite).parquet(storeE)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("vec_id LONG")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val (v2, e0, _, _) = HnswIndex.remove(
            spark.read.parquet(storeV), spark.read.parquet(storeE),
            batch.localCheckpoint())
          // remove() checkpoints v2/e0 eagerly, so the reads above are
          // fully materialized before the overwrite clobbers them
          v2.write.mode(SaveMode.Overwrite).parquet(storeV)
          e0.write.mode(SaveMode.Overwrite).parquet(storeE)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def arrive(name: String, rows: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("shnswd-tmp").toString
      rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(in, s"$name.parquet"))
    }

    arrive("t1", t1)
    runOnce()
    // batch 2 AFTER a stream restart: state must come back from the store
    arrive("t2", t2)
    runOnce()

    // hand replay: the same two removes over the same seed
    val (hv1, he1, _, _) = HnswIndex.remove(v, HnswIndex.buildE0(v), t1)
    val (hv2, he2, _, _) = HnswIndex.remove(hv1, he1, t2)

    assert(spark.read.parquet(storeV).count() == hv2.count())
    assert(edgeSet(spark.read.parquet(storeE)) == edgeSet(he2),
      "streamed layer-0 edges differ from hand-replayed removes")

    // nothing new → store untouched
    val before = edgeSet(spark.read.parquet(storeE))
    runOnce()
    assert(edgeSet(spark.read.parquet(storeE)) == before)
  }
}
