package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ops.HnswIndex

/** Streaming incremental HNSW maintenance — the production loop a
  * growing vector corpus runs: embedding batches stream in, each
  * micro-batch is absorbed into a STANDING index store by the SAME
  * [[HnswIndex.insert]] the batch query uses (foreachBatch — the
  * StreamingDedupSpec pattern), and the store survives restarts via the
  * stream checkpoint. The standing state is exactly two parquet tables:
  * the leveled vectors and the layer-0 neighbor list — upper layers are
  * geometric (≤ N/4 nodes) and are rebuilt per insert, never stored.
  *
  * Proven here:
  *   1. two batches absorbed across a STREAM RESTART leave the same
  *      store as hand-replaying the same two inserts (state lives in
  *      the store + checkpoint, not the query);
  *   2. re-running with nothing new leaves the store untouched, and a
  *      RE-DELIVERED batch (the foreachBatch at-least-once case: retry
  *      after the store overwrite, before the checkpoint commit) is a
  *      content no-op — the store is at-least-once delivered but
  *      idempotent, because [[HnswIndex.insert]] anti-joins the batch
  *      against standing vec_ids;
  *   3. search over the streamed store == search over the hand-replayed
  *      index, row-for-row.
  */
class StreamingHnswSpec extends SparkSpec {

  test("foreachBatch HNSW maintenance == hand-replayed inserts, across restart") {
    graft.functions.CosineSimExpr.register(spark)
    val in = Files.createTempDirectory("shnsw-in").toString
    val storeV = Files.createTempDirectory("shnsw-store").toString + "/vectors"
    val storeE = Files.createTempDirectory("shnsw-store").toString + "/edges0"
    val cp = Files.createTempDirectory("shnsw-cp").toString

    val v = graft.queries.Round15Ops2.leveled(spark, sf)
      .localCheckpoint(eager = true)
    val base = v.filter(col("vec_id") % 10 =!= 0)
    // the appended 10 %, split into two arriving batches
    val b1 = v.filter(col("vec_id") % 20 === 0).select("vec_id", "embedding")
    val b2 = v.filter(col("vec_id") % 20 === 10).select("vec_id", "embedding")

    // seed the standing store: base corpus + its from-scratch layer 0
    base.write.mode(SaveMode.Overwrite).parquet(storeV)
    HnswIndex.buildE0(base).write.mode(SaveMode.Overwrite).parquet(storeE)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val (v2, e0, _, _) = HnswIndex.insert(
            spark.read.parquet(storeV), spark.read.parquet(storeE),
            batch.localCheckpoint())
          // insert() checkpoints v2/e0 eagerly, so the reads above are
          // fully materialized before the overwrite clobbers them
          v2.write.mode(SaveMode.Overwrite).parquet(storeV)
          e0.write.mode(SaveMode.Overwrite).parquet(storeE)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def arrive(name: String, rows: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("shnsw-tmp").toString
      rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(in, s"$name.parquet"))
    }

    arrive("b1", b1)
    runOnce()
    // batch 2 AFTER a stream restart: the index state must come back
    // from the store, not the (gone) query
    arrive("b2", b2)
    runOnce()

    // hand replay: the same two inserts over the same seed
    val (hv1, he1, _, _) = HnswIndex.insert(base, HnswIndex.buildE0(base), b1)
    val (hv2, he2, e1h, e2h) = HnswIndex.insert(hv1, he1, b2)

    def edgeSet(df: DataFrame): Set[(Long, Long, Long)] =
      df.select("src", "dst", "qs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val streamedE = spark.read.parquet(storeE)
    assert(spark.read.parquet(storeV).count() == hv2.count())
    assert(edgeSet(streamedE) == edgeSet(he2),
      "streamed layer-0 edges differ from hand-replayed inserts")

    // nothing new → store untouched
    val before = edgeSet(streamedE)
    runOnce()
    assert(edgeSet(spark.read.parquet(storeE)) == before)

    // at-least-once replay: re-inserting an ALREADY-ABSORBED batch (a
    // foreachBatch retry after the store overwrite but before the
    // checkpoint commit re-delivers it) must be a content no-op
    val (rv, re, _, _) = HnswIndex.insert(hv2, he2, b2)
    assert(rv.count() == hv2.count(),
      "replayed batch duplicated vectors in the standing store")
    assert(edgeSet(re) == edgeSet(he2),
      "replayed batch changed the standing layer-0 edges")

    // search equivalence over the streamed store
    val sv = spark.read.parquet(storeV).localCheckpoint(eager = true)
    val se = spark.read.parquet(storeE).localCheckpoint(eager = true)
    val q8 = sv.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val e1 = graft.queries.Round15Ops2.layerEdges(sv, 1)
    val e2 = graft.queries.Round15Ops2.layerEdges(sv, 2)
    val gotTop = HnswIndex.topk(sv, se, e1, e2, q8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expTop = HnswIndex.topk(hv2, he2, e1h, e2h, q8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotTop == expTop, "search over streamed store differs from replay")
  }
}
