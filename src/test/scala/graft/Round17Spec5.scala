package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.HnswIndex
import graft.queries.Round15Ops2.{leveled, layerEdges, qscore, MTot, NQueries, TopK}

/** Round-17 pins for the interleaved churn lifecycle
  * (q_similarity_hnsw_churn = insert batch → delete batch → search):
  * the composed maintenance result must satisfy BOTH halves'
  * invariants (no surviving edge touches a tombstone, every degree
  * ≤ M_tot — the re-caps compose), and the churned index must still
  * clear the 0.90 recall@10 bar against exact brute force over the
  * surviving corpus — the quality claim for the composition, not just
  * each path in isolation.
  */
class Round17Spec5 extends SparkSpec {

  test("churn: composed invariants hold and recall clears the bar") {
    graft.functions.CosineSimExpr.register(spark)
    val v = leveled(spark, sf).localCheckpoint(eager = true)
    val base = v.filter(col("vec_id") % 10 =!= 0)
    val batch = v.filter(col("vec_id") % 10 === 0).select("vec_id", "embedding")
    val (_, e0m, _, _) = HnswIndex.insert(base, HnswIndex.buildE0(base), batch)
    val ts = v.filter(col("vec_id") % 10 === 9).select("vec_id")
      .localCheckpoint(eager = true)
    val (v3, e0c, e1c, e2c) = HnswIndex.remove(v, e0m, ts)

    // composed invariant 1: no surviving edge touches a tombstone
    val tsSet = ts.collect().map(_.getLong(0)).toSet
    val bad = e0c.filter(col("src").isin(tsSet.toSeq: _*) ||
      col("dst").isin(tsSet.toSeq: _*)).count()
    assert(bad == 0, s"$bad churned edges touch tombstones")

    // composed invariant 2: the re-caps compose — degree ≤ M_tot
    val maxDeg = e0c.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= MTot(0), s"churned out-degree $maxDeg exceeds ${MTot(0)}")

    // inserted nodes survive the delete and remain linked
    val ins = e0c.filter(col("src") % 10 === 0).select("src").distinct().count()
    assert(ins > 0, "no inserted node kept out-links through the churn")

    // recall@10 of the churned index vs brute force over survivors
    val q = v3.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val ann = HnswIndex.topk(v3, e0c, e1c, e2c, q)
      .select(col("q_id"), col("neighbor_id"))
    val bf = v3.select(col("vec_id").as("nid"), col("embedding"))
      .join(broadcast(q), col("nid") =!= col("q_id"))
      .select(col("q_id"), col("nid"),
        qscore(col("embedding"), col("q_emb")).as("qs"))
    val wt = Window.partitionBy("q_id").orderBy(col("qs").desc, col("nid").asc)
    val truth = bf.withColumn("rn", row_number().over(wt))
      .filter(col("rn") <= TopK).select("q_id", "nid")
    val hits = truth.join(ann,
        truth("q_id") === ann("q_id") && truth("nid") === ann("neighbor_id"),
        "left_semi").count()
    val recall = hits.toDouble / (NQueries * TopK)
    info(f"churned recall@10 = $recall%.3f")
    assert(recall >= 0.90, s"churned recall $recall below the 0.90 bar")
  }
}
