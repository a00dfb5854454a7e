package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 23 (Hampel filter, runs test). */
class Round11Spec25 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_window_hampel equals driver brute force on a sampled user") {
    val rows = run("q_window_hampel").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
      .toSet
    // brute force for every user (collect the raw series once)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    def medianOf(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val idx = 0.5 * (s.length - 1)
      val lo = s(idx.toInt)
      val hi = s(math.ceil(idx).toInt)
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      sorted.indices.flatMap { i =>
        val frame = sorted.slice(math.max(0, i - 3), math.min(sorted.length, i + 4))
        val med = medianOf(frame.map(_._4).toSeq)
        val dev = math.abs(sorted(i)._4 - med)
        // the query's MAD frame uses each row's OWN dev column (each
        // frame member's deviation from ITS OWN rolling median):
        val devs = frame.map { e =>
          val j = sorted.indexOf(e)
          val f2 = sorted.slice(math.max(0, j - 3), math.min(sorted.length, j + 4))
          math.abs(e._4 - medianOf(f2.map(_._4).toSeq))
        }
        val mad = medianOf(devs.toSeq)
        if (dev > 3.0 * 1.4826 * mad) Some((u, sorted(i)._2)) else None
      }
    }.toSet
    assert(rows == expect, s"flagged sets differ: got ${rows.size} want ${expect.size}")
  }

  test("q_stats_runs: counts consistent and z matches the closed form") {
    val r = run("q_stats_runs").collect().head
    val na = r.getAs[Long]("n_above"); val nb = r.getAs[Long]("n_below")
    val runs = r.getAs[Long]("runs")
    val er = r.getAs[Double]("expected_runs")
    val z = r.getAs[Double]("z")
    assert(na > 0 && nb > 0)
    // runs bounded by [1, n_above + n_below] and at least 1 boundary
    assert(runs >= 1 && runs <= na + nb)
    val n = (na + nb).toDouble
    val expectEr = 2.0 * na * nb / n + 1.0
    assert(math.abs(er - expectEr) < 1e-12)
    val expectZ = (runs - expectEr) /
      math.sqrt((expectEr - 1.0) * (expectEr - 2.0) / (n - 1.0))
    assert(math.abs(z - expectZ) < 1e-12)
  }
}
