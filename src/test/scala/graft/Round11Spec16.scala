package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 14 (mutual information, lexical
  * diversity). */
class Round11Spec16 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_stats_mi equals driver brute force; MI non-negative; total = partial sum") {
    val rows = run("q_stats_mi").collect()
    val per = rows.filter(_.getString(0) != "__total__")
      .map(r => r.getString(0) -> r.getAs[Double]("mi_part")).toMap
    val total = rows.find(_.getString(0) == "__total__").get.getAs[Double]("mi_part")
    // brute force from the raw table
    val data = Tables.documents(spark, sf)
      .select(col("source"),
        least(lit(9L), floor(col("n_chars") / lit(100)).cast("long")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = data.length.toDouble
    val nxy = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nx = data.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ny = data.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    var tot = 0.0
    nx.keys.toSeq.sorted.foreach { src =>
      val part = nxy.collect { case ((x, y), c) if x == src => (y, c) }
        .toSeq.sortBy(_._1).map { case (y, c) =>
          (c / n) * math.log(n * c / (nx(src).toDouble * ny(y).toDouble))
        }.foldLeft(0.0)(_ + _)
      assert(math.abs(per(src) - part) < 1e-9, s"source $src")
      tot += part
    }
    assert(math.abs(total - tot) < 1e-9)
    assert(total >= -1e-12, s"MI must be non-negative, got $total")
  }

  test("q_text_ttr: per-doc type/token counts match brute force; bounds hold") {
    val rows = run("q_text_ttr").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("ttr"), r.getAs[Double]("guiraud")))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val (nt, ty, ttr, g) = rows(id)
        assert(nt == toks.length, s"doc $id tokens")
        assert(ty == toks.distinct.length, s"doc $id types")
        assert(math.abs(ttr - ty.toDouble / nt) < 1e-12)
        assert(math.abs(g - ty / math.sqrt(nt.toDouble)) < 1e-12)
        assert(ttr > 0.0 && ttr <= 1.0)
      } else assert(!rows.contains(id))
    }
    assert(rows.size == docs.count(_._2.toLowerCase.split(" ", -1).exists(_.nonEmpty)))
  }
}
