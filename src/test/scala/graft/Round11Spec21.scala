package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 19 (kNN classify, local clustering
  * coefficient). */
class Round11Spec21 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_emb_knn_classify equals driver brute-force LOO 3-NN over LSH candidates") {
    val rows = run("q_emb_knn_classify").collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n_classified"), r.getAs[Long]("n_correct"),
          r.getAs[Double]("accuracy")))).toMap
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def bucket(v: Array[Float]): Int =
      (0 until 4).map(i => if (v(i) > 0f) 1 << i else 0).sum
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val byBucket = data.groupBy(d => bucket(d._3))
    val results = data.flatMap { case (id, y, v) =>
      val cands = byBucket(bucket(v)).filter(_._1 != id)
      if (cands.isEmpty) None
      else {
        val top3 = cands.map(c => (cos(v, c._3), c._1, c._2))
          .sortBy(t => (-t._1, t._2)).take(3)
        val votes = top3.groupBy(_._3).view.mapValues(_.size).toSeq
          .sortBy(t => (-t._2, t._1))
        Some((y, votes.head._1))
      }
    }
    val expect = results.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.count(t => t._2 == t._1).toLong)
    }.toMap
    assert(rows.keySet == expect.keySet)
    expect.foreach { case (lab, (n, correct)) =>
      val (gn, gc, acc) = rows(lab)
      assert(gn == n && gc == correct, s"label $lab: got ($gn,$gc) want ($n,$correct)")
      assert(math.abs(acc - correct.toDouble / n) < 1e-12)
    }
  }

  test("q_graph_localcc: lcc in [0,1], consistent with q_graph_triangles counts") {
    val lcc = run("q_graph_localcc").collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          r.getAs[Double]("lcc")))).toMap
    val tri = run("q_graph_triangles").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles")).toMap
    lcc.foreach { case (node, (deg, t, c)) =>
      assert(deg >= 2)
      assert(t == tri.getOrElse(node, 0L), s"node $node triangles")
      val expect = 2.0 * t / (deg.toDouble * (deg - 1))
      assert(math.abs(c - expect) < 1e-12)
      assert(c >= 0.0 && c <= 1.0 + 1e-12, s"node $node lcc $c")
    }
    // every node with a triangle appears (deg >= 2 is implied by a triangle)
    tri.keys.foreach(n => assert(lcc.contains(n), s"node $n missing"))
  }
}
