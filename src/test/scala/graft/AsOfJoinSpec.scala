package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.ops.Joins
import graft.plans.AsOfJoinExec

/** Edge-semantics pins for the native as-of join (graft.plans.AsOfJoin):
  * backward match, left-outer nulls, latest-wins among qualifying right
  * rows, per-key isolation, and the physical plan actually being
  * AsOfJoinExec (not a fallback join). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asof(l: Seq[(Long, Long, String)], r: Seq[(Long, Long, String)]) = {
    val left = l.toDF("k", "t", "lv")
    val right = r.toDF("rk", "rt", "rv")
    Joins.asofBackward(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "lv", "rt", "rv")
      .orderBy("k", "t")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) -1L else row.getLong(3),
        Option(row.getString(4)).getOrElse("-")))
      .toSeq
  }

  test("backward match picks greatest right time <= left time, per key") {
    val got = asof(
      l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")),
      r = Seq((1L, 8L, "r8"), (1L, 15L, "r15"), (3L, 1L, "r1")))
    assert(got == Seq(
      (1L, 10L, "a", 8L, "r8"),     // 8 <= 10 < 15
      (1L, 20L, "b", 15L, "r15"),   // latest qualifying wins
      (2L, 5L, "c", -1L, "-")))     // no key-2 right rows → left outer
  }

  test("equal timestamps match (<=, not <)") {
    val got = asof(l = Seq((1L, 10L, "a")), r = Seq((1L, 10L, "r10")))
    assert(got == Seq((1L, 10L, "a", 10L, "r10")))
  }

  test("empty right side yields all-null matches, not an error") {
    val got = asof(l = Seq((1L, 10L, "a"), (2L, 20L, "b")),
      r = Seq.empty[(Long, Long, String)])
    assert(got == Seq((1L, 10L, "a", -1L, "-"), (2L, 20L, "b", -1L, "-")))
  }

  test("forward direction picks smallest right time >= left time") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c")).toDF("k", "t", "lv")
    val right = Seq((1L, 12L, "r12"), (1L, 18L, "r18"), (1L, 25L, "r25")).toDF("rk", "rt", "rv")
    val got = Joins.asofForward(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("t", "rt", "rv").orderBy("t").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSeq
    assert(got == Seq((10L, 12L, "r12"), (20L, 25L, "r25"), (30L, -1L, "-")))
  }

  test("right rows later than every left row never match; key changes reset state") {
    val got = asof(
      l = Seq((1L, 10L, "a"), (2L, 10L, "b")),
      r = Seq((1L, 99L, "late"), (2L, 3L, "r3")))
    assert(got == Seq((1L, 10L, "a", -1L, "-"), (2L, 10L, "b", 3L, "r3")))
  }

  test("one right row serves many left rows; match carries forward within key") {
    val got = asof(
      l = Seq((1L, 10L, "a"), (1L, 11L, "b"), (1L, 12L, "c")),
      r = Seq((1L, 9L, "r9")))
    assert(got.forall { case (_, _, _, rt, rv) => rt == 9L && rv == "r9" })
  }

  test("null right times never match; null left times get the null extension") {
    val left = Seq((1L, Some(10L), "a"), (1L, None, "b"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, None, "rnull"), (1L, Some(8L), "r8"))
      .toDF("rk", "rt", "rv")
    val got = Joins.asofBackward(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("-")))
      .toMap
    // the null-time right row is skipped even though no real match would
    // exist without it; the null-time left row matches nothing
    assert(got == Map("a" -> "r8", "b" -> "-"))
  }

  test("null right time does not displace the absence of a real match") {
    val got = asof(
      l = Seq((1L, 5L, "a")),                 // t=5: r8 is in the future
      r = Seq((1L, 8L, "r8")))
    assert(got == Seq((1L, 5L, "a", -1L, "-")))
    // same shape but the only candidate has a null time → still no match
    val left = Seq((1L, 5L, "a")).toDF("k", "t", "lv")
    val right = Seq((1L, Option.empty[Long], "rnull")).toDF("rk", "rt", "rv")
    val r2 = Joins.asofBackward(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("rv").collect()
    assert(r2.length == 1 && r2.head.isNullAt(0))
  }

  test("mismatched key or time types fail construction, not execution") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val rInt = Seq((1, 8L, "r")).toDF("rk", "rt", "rv")       // INT key vs LONG
    val e1 = intercept[IllegalArgumentException] {
      Joins.asofBackward(left, rInt, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(e1.getMessage.contains("key type mismatch"))
    val rTs = Seq((1L, "x", "r")).toDF("rk", "rt", "rv")      // STRING time
    val e2 = intercept[IllegalArgumentException] {
      Joins.asofBackward(left, rTs, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(e2.getMessage.contains("time type mismatch"))
    val e3 = intercept[IllegalArgumentException] {
      Joins.asofBackward(left, left.toDF("rk", "rt", "rv"),
        Seq("k", "t"), Seq("rk"), "t", "rt")
    }
    assert(e3.getMessage.contains("left keys"))
  }

  test("physical plan is AsOfJoinExec with co-partitioned sorted children") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val right = Seq((1L, 8L, "r")).toDF("rk", "rt", "rv")
    val plan = Joins.asofBackward(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .queryExecution.executedPlan
    def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[AsOfJoinExec] = {
      val here = p.collect { case a: AsOfJoinExec => a }
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan) }.flatten
      here ++ nested
    }
    assert(find(plan).nonEmpty, s"expected AsOfJoinExec in:\n$plan")
  }

  test("matches DuckDB-ASOF-equivalent computed via window emulation on real data") {
    // Independent in-Spark reference: the union + last(ignoreNulls) window
    // emulation over the same deduped inputs must agree row-for-row.
    val ev = Tables.events(spark, sf)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        date_trunc("MILLISECOND", col("ts")).as("err_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"),
        date_trunc("MILLISECOND", col("ts")).as("click_ts"))
      .agg(max("event_id").as("click_id"))
    val native = Joins.asofBackward(errors, clicks,
        Seq("user_id"), Seq("c_user"), "err_ts", "click_ts")
      .select(col("event_id"), coalesce(col("click_id"), lit(-1L)).as("click_id"))

    import org.apache.spark.sql.expressions.Window
    val u = errors.select(col("user_id"), col("err_ts").as("tsm"),
        col("event_id"), lit(null).cast("long").as("cid"), lit(1).as("is_err"))
      .unionAll(clicks.select(col("c_user"), col("click_ts"),
        col("click_id") * -1, col("click_id").as("cid"), lit(0)))
    // order clicks (is_err=0) before errors at equal tsm: as-of is <=,
    // so a same-millisecond click must be visible to the error's frame
    val w = Window.partitionBy("user_id").orderBy("tsm", "is_err")
      .rowsBetween(Window.unboundedPreceding, 0)
    val emulated = u
      .withColumn("last_click", last(col("cid"), ignoreNulls = true).over(w))
      .filter(col("is_err") === 1)
      .select(col("event_id"), coalesce(col("last_click"), lit(-1L)).as("click_id"))

    assert(native.exceptAll(emulated).isEmpty && emulated.exceptAll(native).isEmpty)
  }
}
