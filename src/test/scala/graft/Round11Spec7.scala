package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 6 (Bloom-pruned join, systematic
  * sampling, percent-rank deciles). */
class Round11Spec7 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_join_bloom_pruned: equals the plain join AND the sketch prunes") {
    val got = run("q_join_bloom_pruned").collect()
    // plain-join reference (what the oracle computes)
    val sup = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    val plain = Tables.lineitem(spark, sf)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_items"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("n_items"))).toMap
      == plain)
    // the sketch itself must PRUNE: probe lineitem and require that the
    // pass-through count is well under the full table (FP rate of the
    // 16 Kbit filter over 1 nation's keys is tiny; 24/25 nations drop)
    graft.functions.BloomFns.register(spark)
    val bf = sup.agg(expr("graft_bloom_agg(xxhash64(s_suppkey), 1024L, 16384L)"))
      .head().getAs[Array[Byte]](0)
    if (bf != null) {
      val total = Tables.lineitem(spark, sf).count()
      val kept = Tables.lineitem(spark, sf)
        .filter(call_function("graft_might_contain", lit(bf),
          xxhash64(col("l_suppkey")))).count()
      assert(kept < total / 2, s"bloom kept $kept of $total — no pruning")
      // and it never drops a TRUE match (no false negatives)
      val trueRows = Tables.lineitem(spark, sf)
        .join(sup, col("l_suppkey") === col("s_suppkey")).count()
      assert(kept >= trueRows)
    }
  }

  test("q_sample_systematic: exact ceil(N/7) size, ranks are 1 mod 7, spread") {
    val rows = run("q_sample_systematic").collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == ((n + 6) / 7).toInt, s"${rows.length} != ceil($n/7)")
    val rns = rows.map(_.getAs[Long]("rn"))
    assert(rns.forall(_ % 7 == 1))
    assert(rns.distinct.length == rns.length)
    // systematic = consecutive sampled ranks exactly 7 apart
    val sorted = rns.sorted
    assert(sorted.zip(sorted.tail).forall { case (a, b) => b - a == 7 })
    // doc_ids unique (rank was a total order)
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("q_window_percentrank: deciles cover all customers; brute-force check") {
    val rows = run("q_window_percentrank").collect()
    val perDecile = rows.map(r =>
      r.getAs[Long]("decile") -> r.getAs[Long]("n_customers")).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("string"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = orders.groupBy(_._1).values.map { os =>
      val latest = os.maxBy(o => (o._3, o._2))
      val byPrice = os.sortBy(o => (o._4, o._2))
      val rn = byPrice.indexWhere(_._2 == latest._2) + 1
      val cnt = os.length
      if (cnt == 1) 0L else math.min(9L, (10L * (rn - 1)) / (cnt - 1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(perDecile == expected, s"$perDecile != $expected")
    assert(rows.map(_.getAs[Long]("n_customers")).sum ==
      orders.map(_._1).distinct.length)
  }
}
