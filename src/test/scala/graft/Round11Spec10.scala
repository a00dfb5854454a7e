package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 9 (Kneser-Ney NLL, hard-negative
  * mining). */
class Round11Spec10 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_text_kn_nll: matches driver-side Kneser-Ney brute force") {
    val rows = run("q_text_kn_nll").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bg"), r.getAs[Long]("n_unseen"),
          r.getAs[Double]("nll")))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        pmod(conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long"), lit(100L)).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def bigs(t: String) = {
      val w = t.split(" ", -1); w.zip(w.tail)
    }
    val train = docs.filter(_._3 < 80)
    val c12 = train.flatMap(d => bigs(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1w1 = c12.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val prec = c12.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val f = c12.size.toLong
    val v = train.flatMap(_._2.split(" ", -1)).distinct.length.toLong
    docs.foreach { case (id, text, _) =>
      val bgList = bigs(text)
      val tf = bgList.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nBg = bgList.length.toLong
      val nUnseen = tf.collect {
        case (p, c) if !c12.contains(p) => c
      }.sum
      val fp = (f + v).toDouble
      // per-doc fold over (w1, w2)-sorted distinct pairs (Spark's
      // array_sort on (w1, w2, term) structs == sort by the pair)
      val sum = tf.toSeq.sortBy(_._1).map { case (p @ (w1, w2), c) =>
        val ep = (prec.getOrElse(w2, 0L) + 1).toDouble
        val lp = c1.get(w1) match {
          case Some(cc1) =>
            val disc = math.max(4L * c12.getOrElse(p, 0L) - 3L, 0L).toDouble
            math.log((disc * fp + 3.0 * n1w1(w1) * ep) / (4.0 * cc1 * fp))
          case None => math.log(ep / fp)
        }
        c * lp
      }.foldLeft(0.0)(_ + _)
      val (gBg, gUn, gNll) = rows(id)
      assert(gBg == nBg && gUn == nUnseen, s"doc $id counts")
      assert(math.abs(gNll - (-1.0 * sum / nBg)) < 1e-9, s"doc $id nll")
    }
  }

  test("q_emb_hardnegatives: negatives are cross-label, ranked, margin vs best positive") {
    val rows = run("q_emb_hardnegatives").collect()
    assert(rows.nonEmpty)
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
    def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]) = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = embs.map(e => e._1 -> e).toMap
    rows.groupBy(_.getAs[Long]("a_id")).foreach { case (aId, qs) =>
      val (_, aLabel, aVec) = byId(aId)
      // brute-force expected negative set
      val negs = embs.filter(e => e._1 != aId && e._2 != aLabel)
        .map(e => (e._1, cos(aVec, e._3)))
        .sortBy(e => (-e._2, e._1)).take(5).map(_._1).toSeq
      assert(qs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("neg_id")).toSeq
        == negs, s"anchor $aId")
      val bestPos = embs.filter(e => e._1 != aId && e._2 == aLabel)
        .map(e => cos(aVec, e._3)).maxOption.getOrElse(0.0)
      qs.foreach { q =>
        assert(q.getAs[Int]("neg_label") != aLabel)
        assert(math.abs(q.getAs[Double]("margin") -
          (bestPos - q.getAs[Double]("sim"))) < 1e-9)
      }
    }
  }
}
