package graft

/** Driver-contract smoke tests. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle has a matching query; names are distinct") {
    val q = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(q.keySet))
    assert(q.size >= 45)
  }

  test("approx_count_distinct lands within 5% of exact counts") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_agg_approx")(spark, sf)
      .join(Tables.lineitem(spark, sf).groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts")), Seq("l_returnflag"))
      .collect()
    got.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("all queries execute and return rows on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0 && name != "q_except") Some(name) else None
    }
    assert(empties.isEmpty, s"queries with zero rows: $empties")
  }
}
