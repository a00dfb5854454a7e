package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 15 (class-centroid shift, patchify). */
class Round11Spec17 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_emb_centroid_shift equals brute-force mean-vector distances") {
    val rows = run("q_emb_centroid_shift").collect()
      .map(r => (r.getAs[Long]("label_a"), r.getAs[Long]("label_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("dist2"), r.getAs[Double]("dist")))).toMap
    val data = Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val byLabel = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val labels = byLabel.keys.toSeq.sorted
    // pair count: C(|labels|, 2)
    assert(rows.size == labels.size * (labels.size - 1) / 2)
    for {
      i <- labels.indices; j <- (i + 1) until labels.size
    } {
      val (la, lb) = (labels(i), labels(j))
      val va = byLabel(la); val vb = byLabel(lb)
      // brute force with the SAME fixed-point quantization
      def mean(vs: Array[Array[Float]], dim: Int): Double =
        vs.map(v => math.floor(v(dim).toDouble * 1e8).toLong).sum
          .toDouble / 1e8 / vs.length
      val d2 = (0 until 64).map { k =>
        val t = mean(va, k) - mean(vb, k); t * t
      }.sum
      val (na, nb, gd2, gd) = rows((la, lb))
      assert(na == va.length && nb == vb.length, s"pair ($la,$lb) counts")
      assert(math.abs(gd2 - d2) < 1e-9, s"pair ($la,$lb) dist2 $gd2 vs $d2")
      assert(math.abs(gd - math.sqrt(d2)) < 1e-9)
    }
  }

  test("q_multimodal_patchify: patches tile each image exactly; luma matches closed form") {
    val rows = run("q_multimodal_patchify").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("patch_y"),
        r.getAs[Int]("patch_x"), r.getAs[Long]("n_px"), r.getAs[Long]("luma_sum")))
    val byDoc = rows.groupBy(_._1)
    val nDocs = Tables.documents(spark, sf).count()
    assert(byDoc.size == nDocs.toInt)
    byDoc.foreach { case (id, ps) =>
      val (w, h) = graft.ops.Multimodal.fixtureDims(id)
      // tiling: pixel counts sum to w*h, grid dims correct
      assert(ps.map(_._4).sum == w.toLong * h)
      assert(ps.map(_._2).max == (h - 1) / 4 && ps.map(_._3).max == (w - 1) / 4)
      // closed-form luma for one spot-check patch per doc (0,0)
      val p00 = ps.find(p => p._2 == 0 && p._3 == 0).get
      var expect = 0L; var n = 0L
      for (y <- 0 until math.min(4, h); x <- 0 until math.min(4, w)) {
        val base = x * 31L + y * 7L + id
        expect += (base % 256) * 299 + ((base + 13) % 256) * 587 +
          ((base + 26) % 256) * 114
        n += 1
      }
      assert(p00._4 == n && p00._5 == expect, s"doc $id patch(0,0)")
    }
  }
}
