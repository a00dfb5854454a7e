package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 22 (encoding advisor, n-gram novelty). */
class Round11Spec24 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_layout_encoding_advisor: totals consistent; zorder helps the clustered keys' files") {
    val rows = run("q_layout_encoding_advisor").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_runs"), r.getAs[Long]("nd_sum"),
          r.getAs[Double]("avg_run_len")))).toMap
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.size == 6)
    rows.foreach { case ((lay, c), (nf, nr, runs, nd, avg)) =>
      assert(nr == n, s"$lay/$c rows")
      // runs within [n_files, n_rows]; distinct sum within [n_files, runs]
      assert(runs >= nf && runs <= nr, s"$lay/$c runs $runs")
      assert(nd >= nf && nd <= runs, s"$lay/$c distinct-sum $nd vs runs $runs")
      assert(math.abs(avg - nr.toDouble / runs) < 1e-12)
    }
    // both layouts see the same corpus: file counts positive
    assert(rows(("natural", "l_returnflag"))._1 > 0)
    assert(rows(("zorder", "l_returnflag"))._1 > 0)
  }

  test("q_text_ngram_novelty equals driver brute force; doc 0 fully novel") {
    val rows = run("q_text_ngram_novelty").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tri"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val triSets = docs.map { case (id, text) =>
      val t = text.toLowerCase.split(" ", -1)
      val tris = (0 until math.max(0, t.length - 2))
        .map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
      (id, tris)
    }
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    triSets.sortBy(_._1).foreach { case (id, tris) =>
      tris.foreach(tr => if (!firstDoc.contains(tr)) firstDoc(tr) = id)
    }
    triSets.foreach { case (id, tris) =>
      if (tris.nonEmpty) {
        val novel = tris.count(firstDoc(_) == id).toLong
        val (gn, gnov, ratio) = rows(id)
        assert(gn == tris.size, s"doc $id n_tri")
        assert(gnov == novel, s"doc $id novel")
        assert(math.abs(ratio - novel.toDouble / tris.size) < 1e-12)
      } else assert(!rows.contains(id))
    }
    // the first doc can only contain first sightings
    val minDoc = triSets.filter(_._2.nonEmpty).map(_._1).min
    assert(rows(minDoc)._3 == 1.0)
  }
}
