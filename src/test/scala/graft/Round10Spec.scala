package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 batch. The hash gate proves value
  * equality vs DuckDB; these pin the mathematical contracts a hash
  * can't express: the Hilbert index is a continuous bijection on the
  * grid, label propagation matches an exact reference run, suffix-LCP
  * agrees with a brute-force reference, and the Count-Min estimate is
  * a bounded overestimate. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Hilbert index is a bijection on the 16x16 grid and every step is edge-adjacent") {
    // drive the exact unrolled expression chain the query uses
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
      .withColumn("hx0", col("x")).withColumn("hy0", col("y"))
      .withColumn("hd0", lit(0L))
    var df = grid
    Seq(8, 4, 2, 1).zipWithIndex.foreach { case (s, i) =>
      // mirror Round10Ops.hilbertStep (private — re-derive the texts)
      val (hx, hy, hd) = (s"hx$i", s"hy$i", s"hd$i")
      val rx = s"(CASE WHEN ($hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN ($hy & $s) > 0 THEN 1 ELSE 0 END)"
      df = df
        .withColumn(s"hd${i + 1}",
          expr(s"$hd + ${s * s} * ($ry + $rx * (3 - 2 * $ry))"))
        .withColumn(s"hx${i + 1}", expr(
          s"CASE WHEN ($hy & $s) > 0 THEN $hx " +
          s"WHEN ($hx & $s) > 0 THEN 15 - $hy ELSE $hy END"))
        .withColumn(s"hy${i + 1}", expr(
          s"CASE WHEN ($hy & $s) > 0 THEN $hy " +
          s"WHEN ($hx & $s) > 0 THEN 15 - $hx ELSE $hx END"))
    }
    val cells = df.select("x", "y", "hd4").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // bijection: the 256 indices are exactly 0..255
    assert(cells.map(_._3).sorted.toSeq == (0L until 256L))
    // continuity: consecutive indices are 4-neighbors on the grid —
    // the locality property z-order lacks (its quadrant seams jump)
    val byD = cells.map { case (x, y, dd) => dd -> (x, y) }.toMap
    (0L until 255L).foreach { dd =>
      val (x1, y1) = byD(dd); val (x2, y2) = byD(dd + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$dd: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("q_layout_hilbert manifest: 64 files, exact row partition, spans tighter than one key-sort") {
    val rows = run("q_layout_hilbert").collect()
    assert(rows.length == 64)
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // every file bounds BOTH key spans to well under full width — the
    // two-sided locality a single-key sort can't give (the sorted key
    // would be tight, the other at ~full width in every file)
    val mp = Tables.lineitem(spark, sf).agg(max("l_partkey")).head().getLong(0)
    val ms = Tables.lineitem(spark, sf).agg(max("l_suppkey")).head().getLong(0)
    val pSpans = rows.map(r => r.getAs[Long]("part_max") - r.getAs[Long]("part_min"))
    val sSpans = rows.map(r => r.getAs[Long]("supp_max") - r.getAs[Long]("supp_min"))
    assert(pSpans.count(_ <= mp / 2) > 32, "most files should span <= half the part range")
    assert(sSpans.count(_ <= ms / 2) > 32, "most files should span <= half the supp range")
  }

  test("q_graph_labelprop equals an exact 4-round synchronous reference") {
    val edges = Tables.lineitem(spark, sf)
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("q"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).view.mapValues(_.length)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = run("q_graph_labelprop").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == labels)
    // propagation actually merged communities
    assert(got.values.toSet.size < got.size)
  }

  test("q_dedup_suffixlcp equals a brute-force suffix-sort reference") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 256).as("txt"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 32)
    val sufs = docs.flatMap { case (id, txt) =>
      (1 to (txt.length - 31) by 4).map { pos =>
        (txt.substring(pos - 1, math.min(pos - 1 + 64, txt.length)), id, pos)
      }
    }.sortBy(s => (s._1, s._2, s._3))
    def lcp(a: String, b: String): Int = {
      var i = 0
      while (i < math.min(a.length, b.length) && a(i) == b(i)) i += 1
      i
    }
    // prefix-sharded like the query: predecessor within the 4-char
    // prefix shard (shard heads get LCP 0 — loss-free at the 32 bar)
    val perDoc = sufs.groupBy(_._1.take(4)).values.flatMap { g =>
      val sg = g.sortBy(s => (s._1, s._2, s._3))
      sg.zipWithIndex.map { case ((sfx, id, _), i) =>
        val l =
          if (i == 0 || sg(i - 1)._2 == id) 0
          else lcp(sfx, sg(i - 1)._1)
        (id, l)
      }
    }.toSeq.groupBy(_._1).view.mapValues { ls =>
      (ls.length.toLong, ls.map(_._2).max.toLong,
        ls.count(_._2 >= 32).toLong)
    }.toMap
    val got = run("q_dedup_suffixlcp").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_suffixes"), r.getAs[Long]("max_lcp"),
          r.getAs[Long]("n_rep32"))).toMap
    assert(got == perDoc)
    // the synthetic corpus contains planted near-dups: some repeat fires
    assert(got.values.exists(_._3 > 0), "expected at least one >=32-char cross-doc repeat")
  }

  test("q_agg_countmin estimates are bounded overestimates of the exact counts") {
    val rows = run("q_agg_countmin").collect()
    assert(rows.length == 20)
    val n = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cm_estimate")
      assert(est >= exact, s"${r.getString(0)}: CM must never underestimate")
      assert(r.getAs[Long]("overcount") == est - exact)
      // 4 rows x 256 buckets: expected colliding mass ~ N/256 per row;
      // the min over 4 rows stays well under the e/w * N classic bound
      assert(est - exact <= 2 * n / 256 + 1,
        s"${r.getString(0)}: overcount ${est - exact} vs N=$n")
    }
  }
}
