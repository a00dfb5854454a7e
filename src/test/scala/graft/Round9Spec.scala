package graft

import org.apache.spark.sql.functions._

/** Semantic property pins for the round-9 operators, on the live sf0.001
  * corpus (hash-equality vs DuckDB is the driver gate; these pin the
  * CONTRACTS the hashes can't express). */
class Round9Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_sample_weighted draws exactly k per stratum with nondecreasing keys") {
    val rows = run("q_sample_weighted").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == 5, s"$lang drew ${rs.length} != 5")
      val keys = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sample_key"))
      assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
        s"$lang keys not sorted by rank")
      assert(keys.forall(_ >= 0.0))
    }
  }

  test("q_emb_quantize saturates the max element and bounds reconstruction error") {
    val rows = run("q_emb_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val nSat = r.getAs[Long]("n_sat")
      val sse = r.getAs[Double]("sse")
      assert(scale > 0.0)
      // the element achieving max|x| quantizes to exactly ±127
      assert(nSat >= 1, s"vec ${r.getAs[Long]("vec_id")} has no saturated lane")
      // per-lane rounding error is ≤ scale/2; 32 dims bound the SSE
      assert(sse >= 0.0 && sse <= 32.0 * (scale / 2) * (scale / 2) * 1.0001,
        s"sse $sse out of bound for scale $scale")
    }
  }

  test("q_text_ngram_coverage stays a fraction and counts every multi-doc gram") {
    val rows = run("q_text_ngram_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_grams")
      val dup = r.getAs[Long]("n_dup")
      val cov = r.getAs[Double]("coverage")
      assert(n > 0 && dup >= 0 && dup <= n)
      assert(math.abs(cov - dup.toDouble / n.toDouble) == 0.0)
    }
  }

  test("q_events_scd2 builds consecutive, gap-free, single-current histories") {
    val rows = run("q_events_scd2").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ==
        (1L to sorted.length.toLong), s"user $uid versions not consecutive")
      // interval chaining: valid_to == next valid_from; exactly one open row
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"), s"user $uid gap")
          // a real state CHANGE at every version boundary
          assert(a.getAs[String]("state") != b.getAs[String]("state"))
        case _ =>
      }
      assert(rs.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[java.sql.Timestamp]("valid_to") ==
        java.sql.Timestamp.valueOf("2200-01-01 00:00:00"))
    }
  }

  test("q_events_anomaly z-scores match a recomputed trailing window") {
    val rows = run("q_events_anomaly").collect()
    assert(rows.nonEmpty)
    // recompute the trailing stats from the raw hourly counts
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("h"), r.getAs[Long]("n")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val h = r.getAs[java.sql.Timestamp]("h")
      val series = hourly(et)
      val i = series.indexWhere(_._2 == h)
      assert(i >= 6, s"$et $h reported with <6 predecessors")
      val prev = series.slice(i - 6, i).map(_._3.toDouble)
      val mean = prev.sum / 6.0
      assert(math.abs(r.getAs[Double]("mean_prev") - mean) < 1e-9)
      Option(r.getAs[java.lang.Double]("z")).foreach { z =>
        val varc = prev.map(x => (x - mean) * (x - mean)).sum / 5.0
        assert(math.abs(z - (series(i)._3.toDouble - mean) / math.sqrt(varc)) < 1e-6)
      }
    }
  }

  test("q_graph_kcore only keeps nodes whose initial degree was >= 3") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val deg0 = li.as("x").join(li.as("y"),
        expr("x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b")).distinct()
      .select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("dg"))
      .filter(col("dg") >= 3)
      .collect().map(_.getAs[Long]("n")).toSet
    val out = run("q_graph_kcore").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => deg0.contains(r.getAs[Long]("node"))))
  }

  test("q_events_attribution credits the latest preceding click, never a later one") {
    val out = run("q_events_attribution").collect()
    assert(out.nonEmpty)
    // independent reconstruction: for each purchase, scan the raw events
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("MILLISECOND", col("ts")).as("tsm"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("tsm")))
      .groupBy(_._1)
    out.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val pid = r.getAs[Long]("purchase_id")
      val pTs = r.getAs[java.sql.Timestamp]("purchase_ts")
      val events = raw(uid).sortBy(e => (e._4.getTime, e._2))
      val ord = Ordering.Tuple2[Long, Long]
      val before = events.takeWhile(e =>
        ord.lt((e._4.getTime, e._2), (pTs.getTime, pid)))
      val expectClick = before.reverse.find(_._3 == "click")
      val gotClick = Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)
      assert(gotClick == expectClick.map(_._2),
        s"user $uid purchase $pid: got $gotClick expected ${expectClick.map(_._2)}")
      val expectAttr = expectClick.exists(c =>
        pTs.getTime - c._4.getTime <= 7L * 24 * 3600 * 1000)
      assert(r.getAs[Boolean]("attributed") == expectAttr)
    }
  }

  test("q_tpch_natvolume covers both directions and only the two nations") {
    val rows = run("q_tpch_natvolume").collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_12", "NATION_13"), ("NATION_13", "NATION_12"))))
    assert(pairs.size == 2, "expected revenue in both directions")
    assert(rows.forall(_.getAs[Double]("revenue") > 0.0))
  }

  test("q_join_pointintime matches every purchase to exactly one valid version") {
    val out = run("q_join_pointintime").collect()
    val nPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.length.toLong == nPurchases,
      s"${out.length} PIT rows != $nPurchases purchases — a purchase matched 0 or 2 intervals")
    // the matched state is what the SCD2 table says was live at that instant
    val scd2 = run("q_events_scd2").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
        (r.getAs[java.sql.Timestamp]("valid_from"), r.getAs[java.sql.Timestamp]("valid_to")))
      .toMap
    out.foreach { r =>
      val (vf, vt) = scd2((r.getAs[Long]("user_id"), r.getAs[Long]("version")))
      val t = r.getAs[java.sql.Timestamp]("ptsm")
      assert(!t.before(vf) && t.before(vt))
    }
  }

  test("q_dedup_containment bounds ratios and detects a planted excerpt") {
    import spark.implicits._
    val rows = run("q_dedup_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c1 = r.getAs[Double]("c_in_1"); val c2 = r.getAs[Double]("c_in_2")
      assert(c1 >= 0.0 && c1 <= 1.0 && c2 >= 0.0 && c2 <= 1.0)
    }
    // planted pair: short doc fully embedded in a long one → containment
    // 1.0 in the short direction even though Jaccard is low
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta " +
        (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{array_distinct, array_intersect, size, split}
    val sets = docs.select($"doc_id",
      array_distinct(graft.ops.TextAnalysis.bigrams(split($"text", " "), " ")).as("s"))
    val Array(a, b) = sets.orderBy("doc_id").collect()
    val sa = a.getSeq[String](1).toSet; val sb = b.getSeq[String](1).toSet
    assert((sa intersect sb).size.toDouble / sa.size == 1.0)
    assert((sa intersect sb).size.toDouble / (sa union sb).size < 0.2)
  }

  test("q_text_cdc_chunks tiles each document exactly and cuts move with content") {
    val rows = run("q_text_cdc_chunks").collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (did, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_idx"))
      // chunks tile [1, n_chars] with no gaps or overlaps
      assert(sorted.head.getAs[Long]("start") == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start") ==
            a.getAs[Long]("start") + a.getAs[Long]("len"))
        case _ =>
      }
      val last = sorted.last
      assert(last.getAs[Long]("start") + last.getAs[Long]("len") - 1 == lens(did))
    }
    // content-defined, not fixed-width: chunk lengths vary across the corpus
    assert(rows.map(_.getAs[Long]("len")).distinct.length > 1)
  }

  test("q_emb_normalize emits unit vectors") {
    // lane-per-row output (vec_id, norm, dim, u) — regroup per vector
    val rows = run("q_emb_normalize").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (vid, lanes) =>
      assert(lanes.head.getAs[Double]("norm") > 0.0)
      assert(lanes.map(_.getAs[Long]("dim")).sorted.toSeq ==
        (0L until lanes.length.toLong))
      val n2 = lanes.foldLeft(0.0) { (acc, r) =>
        val x = r.getAs[Double]("u"); acc + x * x
      }
      assert(math.abs(n2 - 1.0) < 1e-9, s"vec $vid: |unit|² = $n2")
    }
  }

  test("q_window_countdistinct_approx equals the exact twin on this domain") {
    // HLL's sparse mode is exact far beyond the 5-value priority space,
    // so the sketch path must reproduce the collect_set path exactly
    val exact = run("q_window_countdistinct").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("distinct_priorities"))
      .toMap
    val approx = run("q_window_countdistinct_approx").collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      assert(r.getAs[Long]("approx_priorities") ==
        exact(r.getAs[Long]("o_orderkey")))
    }
  }

  test("q_events_paths step counts and session universe agree with q_window_session") {
    val paths = run("q_events_paths").collect()
    assert(paths.nonEmpty && paths.length <= 20)
    // every path decomposes into known event types
    val types = Tables.events(spark, sf).select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    paths.foreach { r =>
      r.getAs[String]("path").split(">").foreach(t => assert(types(t)))
    }
    // the full (un-limited) path distribution must partition the exact
    // session universe q_window_session builds — same gap rule, so the
    // total session count must match
    import org.apache.spark.sql.functions.sum
    val nSessions = run("q_window_session").count()
    // rebuild the session count from the same break rule (the query's
    // top-20 limit hides the tail of the distribution)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsm", "event_id")
    val full = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        date_trunc("MILLISECOND", col("ts")).as("tsm"))
      .withColumn("prev", lag("tsm", 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("tsm") >= col("prev") + expr("interval 10 minutes"), 1L)
        .otherwise(0L))
      .agg(sum("brk")).head().getLong(0)
    assert(full == nSessions,
      s"path session universe $full != session-window count $nSessions")
  }

  test("q_events_transitions rows sum to probability 1 per from_type") {
    val rows = run("q_events_transitions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (from, rs) =>
      val total = rs.map(_.getAs[Double]("prob")).sum
      assert(math.abs(total - 1.0) < 1e-9, s"$from probs sum to $total")
      assert(rs.forall(_.getAs[Long]("n") > 0))
    }
  }

  test("q_window_ntile quartiles are balanced and ranks lie in [0,1]") {
    val rows = run("q_window_ntile").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (seg, rs) =>
      val qs = rs.map(_.getAs[Long]("quartile"))
      assert(qs.forall(q => q >= 1 && q <= 4))
      // equal-height: bucket sizes differ by at most 1
      val sizes = qs.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$seg unbalanced: $sizes")
      assert(rs.forall { r =>
        val p = r.getAs[Double]("pct_rank"); val c = r.getAs[Double]("cume")
        p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0
      })
    }
  }
}
