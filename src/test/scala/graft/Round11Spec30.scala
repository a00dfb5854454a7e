package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 28 (growth accounting, mix KL). */
class Round11Spec30 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_events_growth_accounting: states partition WAU; brute force agrees") {
    val rows = run("q_events_growth_accounting").collect()
      .map(r => r.getAs[Long]("wk") ->
        ((r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))).toMap
    val wu = Tables.events(spark, sf)
      .select((floor(unix_millis(col("ts")) / lit(86400000L)) / lit(7L))
        .cast("long").as("wk"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = wu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val firstWk = wu.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    byWeek.keys.toSeq.sorted.foreach { wk =>
      val act = byWeek(wk)
      val prev = byWeek.getOrElse(wk - 1, Set.empty[Long])
      val nNew = act.count(firstWk(_) == wk).toLong
      val nRet = act.count(prev.contains).toLong
      val nRes = act.count(u => !prev.contains(u) && firstWk(u) != wk).toLong
      val nChu = prev.count(u => !act.contains(u)).toLong
      val (gn, gr, gs, gc) = rows(wk)
      assert((gn, gr, gs, gc) == ((nNew, nRet, nRes, nChu)), s"week $wk")
      // the three active states partition the week's actives
      assert(gn + gr + gs == act.size.toLong, s"week $wk partition")
    }
    assert(rows.keySet == byWeek.keySet)
  }

  test("q_mix_kl: totals are non-negative KL sums; uniform KL matches closed form") {
    val rows = run("q_mix_kl").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("nd"), r.getAs[Double]("kl_uniform_term"),
          r.getAs[Double]("kl_target_term")))).toMap
    val counts = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("nd"),
        sum(length(col("text"))).cast("long").as("nc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val td = counts.map(_._2).sum.toDouble
    val tc = counts.map(_._3).sum.toDouble
    val k = counts.length.toDouble
    var klU = 0.0; var klT = 0.0
    counts.sortBy(_._1).foreach { case (src, nd, nc) =>
      val p = nd / td
      val u = p * math.log(nd * counts.length / td)
      val t = p * math.log((nd * tc) / (td * nc))
      assert(math.abs(rows(src)._2 - u) < 1e-9, s"$src uniform term")
      assert(math.abs(rows(src)._3 - t) < 1e-9, s"$src target term")
      klU += u; klT += t
    }
    val tot = rows("__total__")
    assert(math.abs(tot._2 - klU) < 1e-9 && math.abs(tot._3 - klT) < 1e-9)
    // KL >= 0 (Gibbs) up to float fold error
    assert(tot._2 >= -1e-12 && tot._3 >= -1e-12)
  }
}
