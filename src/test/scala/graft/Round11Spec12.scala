package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 11 (Theil-Sen trend, word
  * burstiness). */
class Round11Spec12 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_stats_theilsen: median pairwise slope matches driver brute force") {
    val r = run("q_stats_theilsen").collect().head
    val days = Tables.orders(spark, sf)
      .select(expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)"))
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val slopes = (for {
      i <- days.indices; j <- (i + 1) until days.length
    } yield (days(j)._2 - days(i)._2).toDouble /
        (days(j)._1 - days(i)._1).toDouble).sorted
    assert(r.getAs[Long]("n_pairs") == slopes.length)
    assert(r.getAs[Double]("median_slope") == slopes((slopes.length + 1) / 2 - 1))
    assert(r.getAs[Long]("n_rising") == slopes.count(_ > 0))
    assert(r.getAs[Long]("n_falling") == slopes.count(_ < 0))
  }

  test("q_text_burstiness: Fano factors match brute force; function words near 1") {
    val rows = run("q_text_burstiness").collect()
    assert(rows.length == 10)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    val counts = docs.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
        .map { case (w, g) => (w, id, g.length.toLong) }
    }
    val byWord = counts.groupBy(_._1)
    rows.foreach { row =>
      val w = row.getAs[String]("word")
      val xs = byWord(w).map(_._3)
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      assert(row.getAs[Long]("total_count") == sx, s"$w sx")
      assert(row.getAs[Long]("n_docs_with") == xs.length.toLong, s"$w docs")
      val vmr = (n * sxx - sx * sx).toDouble / (n * sx).toDouble
      assert(math.abs(row.getAs[Double]("vmr") - vmr) < 1e-12, s"$w vmr")
      assert(row.getAs[Double]("vmr") >= 0.0)
    }
    // the top-10 really are the 10 highest-total words
    val allTotals = byWord.view.mapValues(_.map(_._3).sum).toSeq
      .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    assert(rows.map(_.getAs[String]("word")).toSet == allTotals)
  }
}
