package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 21 (PIT features, balanced sample). */
class Round11Spec23 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_events_pit_features equals driver brute force; excludes same-ms rows") {
    val rows = run("q_events_pit_features").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        ((r.getAs[Long]("f_clicks"), r.getAs[Long]("f_views"),
          r.getAs[Long]("f_errors"), r.getAs[Long]("f_value_micro")))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("tm"),
        floor(col("value") * lit(1e6)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val purchases = ev.filter(_._3 == "purchase")
    assert(rows.size == purchases.length)
    val byUser = ev.groupBy(_._1)
    purchases.foreach { case (u, id, _, tm, _) =>
      val in = byUser(u).filter(e => e._4 >= tm - 86400000L && e._4 <= tm - 1)
      val expect = (in.count(_._3 == "click").toLong,
        in.count(_._3 == "view").toLong,
        in.count(_._3 == "error").toLong,
        in.map(_._5).sum)
      assert(rows((u, id)) == expect, s"user $u event $id")
    }
  }

  test("q_sample_balanced: every class kept at exactly the minority count; digest matches") {
    val rows = run("q_sample_balanced").collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("x0_sum_fx")))
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"),
        element_at(col("embedding"), 1).cast("double"),
        md5(col("vec_id").cast("string").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3)))
    val byLabel = data.groupBy(_._2)
    val k = byLabel.values.map(_.length).min
    assert(rows.map(_._2).distinct.toSeq == Seq(k.toLong))
    assert(rows.length == byLabel.size)
    rows.foreach { case (lab, _, digest) =>
      val kept = byLabel(lab).sortBy(e => (e._4, e._1)).take(k)
      val expect = kept.map(e => math.floor(e._3 * 1e8).toLong).sum
      assert(digest == expect, s"label $lab digest")
    }
  }
}
