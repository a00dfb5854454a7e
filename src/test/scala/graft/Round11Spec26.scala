package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 24 (filtered ANN, effect size). */
class Round11Spec26 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_similarity_filtered: every hit is label-0; ranks dense; matches brute force over buckets") {
    val rows = run("q_similarity_filtered").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("rn"),
        r.getAs[Long]("dst"), r.getAs[Double]("cosine_sim")))
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    val labels = data.map(d => d._1 -> d._2).toMap
    rows.foreach { case (_, _, dst, _) =>
      assert(labels(dst) == 0L, s"dst $dst not label 0")
    }
    // dense ranks per src
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length))
      // similarity non-increasing with rank
      val byRank = g.sortBy(_._2).map(_._4)
      byRank.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b, s"src $src rank order")
        case _ =>
      }
    }
    // brute force over the same LSH buckets
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
    val expect = data.filter(_._1 < 5).flatMap { case (src, _, v) =>
      data.filter(c => c._2 == 0L && c._1 != src && bucket(c._3) == bucket(v))
        .map(c => (src, c._1, cos(v, c._3)))
        .sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
        .map { case ((s2, d2, c2), i) => (s2, (i + 1).toLong, d2) }
    }.toSet
    assert(rows.map(t => (t._1, t._2, t._3)).toSet == expect)
  }

  test("q_stats_effect_size equals brute force; direction agrees with mean difference") {
    val r = run("q_stats_effect_size").collect().head
    val data = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag") === "R", col("l_quantity").cast("long"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val rq = data.filter(_._1).map(_._2.toDouble)
    val aq = data.filter(!_._1).map(_._2.toDouble)
    val meanR = rq.sum / rq.length; val meanA = aq.sum / aq.length
    val ssR = rq.map(x => x * x).sum - rq.sum * rq.sum / rq.length
    val ssA = aq.map(x => x * x).sum - aq.sum * aq.sum / aq.length
    val pooled = math.sqrt((ssR + ssA) / (rq.length + aq.length - 2.0))
    val d = (meanR - meanA) / pooled
    assert(r.getAs[Long]("n_r") == rq.length && r.getAs[Long]("n_a") == aq.length)
    assert(math.abs(r.getAs[Double]("d") - d) < 1e-9)
    assert((r.getAs[Double]("d") > 0) == (meanR > meanA))
  }
}
