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

  test("all queries execute and return rows on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0 && name != "q_except") Some(name) else None
    }
    assert(empties.isEmpty, s"queries with zero rows: $empties")
  }
}
