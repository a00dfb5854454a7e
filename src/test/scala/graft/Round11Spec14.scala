package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 12 (entropy rate, curriculum
  * schedule). */
class Round11Spec14 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_events_entropy_rate: matches driver brute force; bounds hold") {
    val rows = run("q_events_entropy_rate").collect()
    val per = rows.filter(_.getString(0) != "__overall__")
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("c_out"), r.getAs[Long]("n_targets"),
          r.getAs[Double]("h")))).toMap
    val overall = rows.find(_.getString(0) == "__overall__").get.getAs[Double]("h")
    // brute force transitions
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ci = pairs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ctot = ci.values.sum.toDouble
    var acc = 0.0
    ci.toSeq.sortBy(_._1).foreach { case (a, cOut) =>
      val targets = pairs.collect { case ((x, b), c) if x == a => (b, c) }
      val h = targets.toSeq.sortBy(_._1).map { case (_, c) =>
        val p = c.toDouble / cOut
        -1.0 * p * math.log(p)
      }.foldLeft(0.0)(_ + _)
      val (gc, gn, gh) = per(a)
      assert(gc == cOut && gn == targets.size, s"state $a counts")
      assert(math.abs(gh - h) < 1e-9, s"state $a H")
      assert(gh >= -1e-12 && gh <= math.log(per.size.toDouble) + 1e-9)
      acc += (cOut / ctot) * gh
    }
    assert(math.abs(overall - acc) < 1e-9)
  }

  test("q_curation_curriculum: easy->hard band order; positions dense and complete") {
    val rows = run("q_curation_curriculum").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("band"),
        r.getAs[Long]("pos"))).sortBy(_._3)
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n.toInt)
    assert(rows.map(_._3).toSeq == (1L to n))
    // bands never increase along the schedule (easy = high band first)
    rows.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, s"band rose $a -> $b")
      case _ =>
    }
    // every doc appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    // within a band the md5 shuffle holds: doc_ids are not sorted
    // (probabilistically certain for the largest band at any SF)
    val biggest = rows.groupBy(_._2).maxBy(_._2.length)._2.map(_._1).toSeq
    if (biggest.length > 10) assert(biggest != biggest.sorted)
  }
}
