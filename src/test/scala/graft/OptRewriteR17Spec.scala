package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17 optimization-round rewrite contracts, pinned against the ORIGINAL
  * formulations on real corpus data (the oracle gate proves end-to-end
  * equality; these specs pin the specific identity each rewrite relies
  * on, so a future edit that breaks the identity fails here first).
  *
  *  - q_events_trend: the sharded exact median (slope-range bucket +
  *    prefix-sum bucket locate + in-bucket rank) picks the SAME row as
  *    the global row_number over (slope, i, j).
  *  - q_graph_neighbors: slice(sort_array(collect_list(nbr)), 1, 16)
  *    equals the row_number-over-(node ORDER BY nbr) ≤ 16 window cap,
  *    and the in-row i<j expansion equals the capped×capped self-join.
  *  - q_basket_pairs: the in-row per-order pair expansion reproduces the
  *    orderkey self-join's (p1 < p2) pair counts exactly.
  */
class OptRewriteR17Spec extends SparkSpec {

  test("q_events_trend: sharded median picks the global-window median row") {
    val hb = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        floor(col("value") * 1000000).cast("long").as("v"))
      .groupBy("event_type", "h").agg(sum("v").as("x"))
      .withColumn("k", row_number().over(Window.partitionBy("event_type")
        .orderBy("h")).cast("long"))
    val pairs = hb.as("a").join(hb.as("b"),
        expr("a.event_type = b.event_type AND a.k < b.k"))
      .select(col("a.event_type").as("event_type"),
        col("a.k").as("i"), col("b.k").as("j"),
        ((col("b.x") - col("a.x")).cast("double") /
          (col("b.k") - col("a.k")).cast("double")).as("slope"))
    val m = pairs.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
    // the ORIGINAL global pick
    val pick = Window.partitionBy("event_type")
      .orderBy(col("slope").asc, col("i").asc, col("j").asc)
    val reference = pairs.withColumn("rk", row_number().over(pick).cast("long"))
      .join(m, "event_type")
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        col("slope").as("median_slope_micro_per_hour"))
    val optimized = SparkEntry.queries("q_events_trend")(spark, sf)
    val diff = optimized.exceptAll(reference).count() +
      reference.exceptAll(optimized).count()
    assert(diff == 0, s"sharded median != global-window median ($diff rows)")
    assert(optimized.count() > 0, "trend output is empty")
  }

  test("q_graph_neighbors: in-row capped pairs == window cap + self-join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val pairs = li.as("x").join(li.as("y"),
        expr("x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
    val adj = pairs.select(col("a").as("node"), col("b").as("nbr"))
      .unionAll(pairs.select(col("b").as("node"), col("a").as("nbr")))
    // the ORIGINAL capped wedge-pair counts
    val w = Window.partitionBy("node").orderBy("nbr")
    val capped = adj.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 16).select("node", "nbr")
    val reference = capped.as("x").join(capped.as("y"),
        expr("x.node = y.node AND x.nbr < y.nbr"))
      .groupBy(col("x.nbr").as("a"), col("y.nbr").as("b"))
      .agg(count(lit(1)).as("common"))
    // the REWRITE's frame (same expressions as q_graph_neighbors)
    val capped16 = adj.groupBy("node")
      .agg(slice(sort_array(collect_list(col("nbr"))), 1, 16).as("ns"))
    val optimized = capped16
      .select(explode(flatten(transform(col("ns"), (x, i) =>
        transform(slice(col("ns"), i + lit(2),
            greatest(size(col("ns")) - i - lit(1), lit(0))),
          y => struct(x.as("a"), y.as("b")))))).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(count(lit(1)).as("common"))
    val diff = optimized.exceptAll(reference).count() +
      reference.exceptAll(optimized).count()
    assert(diff == 0, s"in-row capped pairs != window+self-join ($diff rows)")
    assert(optimized.count() > 0, "no candidate pairs produced")
  }

  test("q_basket_pairs: in-row basket pairs == orderkey self-join counts") {
    val b = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val reference = b.as("b1").join(b.as("b2"),
        col("b1.l_orderkey") === col("b2.l_orderkey") &&
          col("b1.l_partkey") < col("b2.l_partkey"))
      .groupBy(col("b1.l_partkey").as("p1"), col("b2.l_partkey").as("p2"))
      .agg(count(lit(1)).as("n12"))
    val optimized = b.groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2),
            greatest(size(col("ps")) - i - lit(1), lit(0))),
          y => struct(x.as("p1"), y.as("p2")))))).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("n12"))
    val diff = optimized.exceptAll(reference).count() +
      reference.exceptAll(optimized).count()
    assert(diff == 0, s"in-row basket pairs != self-join counts ($diff rows)")
    assert(optimized.count() > 0, "no basket pairs produced")
  }
}
