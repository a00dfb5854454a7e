package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 26 (curation funnel, seasonal
  * strength). */
class Round11Spec28 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_curation_funnel: stages monotone non-increasing; counts match brute force") {
    val rows = run("q_curation_funnel").collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[String]("stage_name"),
        r.getAs[Long]("rows_out"), r.getAs[Double]("survival")))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ==
      Seq("raw", "lang_en", "quality", "dedup_exact", "cap_source"))
    // monotone non-increasing survivors
    rows.map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b)
      case _ =>
    }
    // brute force
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val n0 = docs.length
    val l1 = docs.filter(_._3 == "en")
    val l2 = l1.filter { case (_, _, _, t) =>
      val words = t.split(" ", -1).count(_.nonEmpty)
      val c = t.length.toLong
      val sy = t.count("{}()[];=<>+*/&|^%#@!~`\\-".contains(_)).toLong
      val br = t.count("{}()[]".contains(_)).toLong
      val vo = t.toLowerCase.count("aeiou".contains(_)).toLong
      val rules = (if (4 * sy > c) 1 else 0) +
        (if (100 * br >= 8 * c) 1 else 0) + (if (5 * vo < c) 1 else 0)
      words >= 10 && words <= 5000 && rules < 2
    }
    val l3 = l2.groupBy(_._4).map { case (_, g) => g.minBy(_._1) }.toSeq
    val l4 = l3.groupBy(_._2).values.map(_.size.min(20)).sum
    val got = rows.map(r => r._1 -> r._3).toMap
    assert(got(0L) == n0 && got(1L) == l1.length && got(2L) == l2.length)
    assert(got(3L) == l3.length && got(4L) == l4.toLong)
    assert(math.abs(rows.last._4 - l4.toDouble / n0) < 1e-12)
  }

  test("q_events_seasonal_strength: matches brute force; strength in [0, 1]") {
    val r = run("q_events_seasonal_strength").collect().head
    val daily = Tables.events(spark, sf)
      .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .groupBy("day").count()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = daily.length.toDouble
    val xs = daily.map(_._2.toDouble)
    val varX = xs.map(x => x * x).sum / n - math.pow(xs.sum / n, 2)
    val byDow = daily.groupBy(d => d._1 % 7)
    val varE = daily.map { case (day, cnt) =>
      val g = byDow(day % 7)
      val m = g.map(_._2).sum.toDouble / g.length
      (cnt - m) * (cnt - m)
    }.sum / n
    val strength = math.max(0.0, 1.0 - varE / varX)
    assert(r.getAs[Long]("n") == daily.length)
    assert(math.abs(r.getAs[Double]("var_x") - varX) < 1e-6 * varX)
    assert(math.abs(r.getAs[Double]("var_e") - varE) < 1e-6 * math.max(varE, 1e-9))
    assert(math.abs(r.getAs[Double]("strength") - strength) < 1e-9)
    assert(r.getAs[Double]("strength") >= 0.0 && r.getAs[Double]("strength") <= 1.0)
  }
}
