package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 late batch (BPE training, basket
  * mining, CDC merge, snapshot diff, quality constraints, concurrency,
  * engagement) — each checked against an INDEPENDENT driver-side
  * reference recomputation on the live sf0.001 corpus, the contracts
  * the driver's hash gate can't express. */
class Round9bSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- reference BPE (straightforward list-based implementation) ----

  private def refBpe(words: Map[String, Long], rounds: Int): Seq[(String, Long)] = {
    var syms: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.toVector.map(_.toString) }(_._2)(_ + _)
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      syms.foreach { case (s, f) =>
        s.indices.dropRight(1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
        }
      }
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
      syms = syms.groupMapReduce { case (s, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
          else { out += s(i); i += 1 }
        }
        out.result()
      }(_._2)(_ + _)
      (s"$a $b", cnt)
    }
  }

  test("q_text_bpe_train matches a reference BPE implementation merge-for-merge") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").count().collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("count")).toMap
    val expected = refBpe(words, 3)
    val got = run("q_text_bpe_train").collect()
      .sortBy(_.getAs[Long]("iter"))
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt")))
      .toSeq
    assert(got == expected, s"got $got, expected $expected")
    // merged symbol is the pair's concatenation
    run("q_text_bpe_train").collect().foreach { r =>
      assert(r.getAs[String]("new_sym") == r.getAs[String]("pair").replace(" ", ""))
    }
  }

  test("q_basket_pairs scores oriented pairs with brute-force support and lift") {
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nBaskets = byOrder.size.toLong
    val partN = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { parts =>
      val ps = parts.toSeq.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairN((ps(i), ps(j))) = pairN.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    val rows = run("q_basket_pairs").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
      assert(p1 < p2, "pair not oriented")
      val n12 = r.getAs[Long]("n12")
      assert(n12 == pairN((p1, p2)))
      assert(r.getAs[Double]("support") == n12.toDouble / nBaskets.toDouble)
      assert(r.getAs[Double]("lift") ==
        (n12 * nBaskets).toDouble / (partN(p1) * partN(p2)).toDouble)
    }
    // top-20 really is the count-descending head of the full pair set
    val minShown = rows.map(_.getAs[Long]("n12")).min
    assert(pairN.count { case (_, c) => c > minShown } <= rows.length)
  }

  test("q_merge_cdc applies latest-seq updates, drops tombstones, adds inserts") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val merged = run("q_merge_cdc").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    val expectedCount = orders.size - orders.keys.count(_ % 7 == 3) +
      orders.keys.count(_ % 7 == 5)
    assert(merged.size == expectedCount)
    orders.foreach { case (k, price) =>
      if (k % 7 == 3) assert(!merged.contains(k), s"tombstoned key $k survived")
      else if (k % 21 == 0)
        assert(merged(k).getAs[Double]("o_totalprice") == price + 20.0,
          s"key $k missed the seq-2 update")
      else if (k % 7 == 0)
        assert(merged(k).getAs[Double]("o_totalprice") == price + 10.0)
      else assert(merged(k).getAs[Double]("o_totalprice") == price)
      if (k % 7 == 5) {
        val ins = merged(k + 10000000L)
        assert(ins.getAs[String]("o_orderstatus") == "N" &&
          ins.getAs[Double]("o_totalprice") == price)
      }
    }
  }

  test("q_snapshot_diff labels added/removed/changed by the staging arithmetic") {
    val keys = Tables.orders(spark, sf).select("o_orderkey").collect().map(_.getLong(0))
    val rows = run("q_snapshot_diff").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("status")).toMap
    keys.foreach { k =>
      val expected =
        if (k % 13 == 0 && k % 17 != 0) Some("added")
        else if (k % 17 == 0 && k % 13 != 0) Some("removed")
        else if (k % 13 == 0 && k % 17 == 0) None // in neither snapshot
        else if (k % 5 == 0) Some("changed")
        else None
      assert(rows.get(k) == expected, s"key $k: got ${rows.get(k)}, want $expected")
    }
  }

  test("q_quality_constraints reports the injected violation fractions") {
    val keys = Tables.orders(spark, sf).select("o_orderkey").collect().map(_.getLong(0))
    val lkeys = Tables.lineitem(spark, sf).select("l_orderkey").collect().map(_.getLong(0))
    val n = keys.length.toDouble
    val rows = run("q_quality_constraints").collect()
      .map(r => r.getAs[String]("check") ->
        (r.getAs[Double]("metric"), r.getAs[Boolean]("passed"))).toMap
    assert(rows.size == 5)
    val completeness = keys.count(_ % 97 != 0) / n
    assert(rows("completeness_custkey")._1 == completeness)
    val distinct = keys.map(k => if (k % 61 == 0) 999999L else k).distinct.length / n
    assert(rows("uniqueness_orderkey")._1 == distinct)
    // staged fk is -k for %53 keys; -0 == 0 is still a live order key
    val orderKeys = keys.toSet
    val fk = lkeys.count(k => k % 53 != 0 || orderKeys.contains(-k)) /
      lkeys.length.toDouble
    assert(rows("fk_lineitem_orderkey")._1 == fk)
    // thresholds gate as declared
    assert(rows("completeness_custkey")._2 == (completeness >= 0.99))
    assert(rows("uniqueness_orderkey")._2 == (distinct >= 1.0))
    assert(rows("fk_lineitem_orderkey")._2 == (fk >= 0.99))
    // the suite must exercise both outcomes on this corpus
    assert(rows.values.exists(_._2) && rows.values.exists(!_._2))
  }

  // ---- shared reference sessionizer (10-min gap, (tsm, event_id) order) ----

  private def refSessions(): Seq[(Long, Long)] = { // (startMs, endMs)
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        date_trunc("MILLISECOND", col("ts")).as("tsm"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("tsm").getTime))
      .groupBy(_._1).values.flatMap { evs =>
        val sorted = evs.sortBy(e => (e._3, e._2))
        val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        sorted.foreach { case (_, _, t) =>
          if (spans.nonEmpty && t < spans.last._2 + 600000L)
            spans(spans.length - 1) = (spans.last._1, t)
          else spans += ((t, t))
        }
        spans
      }.toSeq
  }

  test("q_events_concurrency matches hour-by-hour reference session overlap") {
    val expected = refSessions()
      .flatMap { case (st, en) =>
        (st / 3600000L) to (en / 3600000L) map (_ * 3600000L)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q_events_concurrency").collect()
      .map(r => r.getAs[java.sql.Timestamp]("h").getTime -> r.getAs[Long]("n_active"))
      .toMap
    assert(got == expected)
  }

  test("q_customer_rfm grades against the population quartiles, not ntile") {
    val rows = run("q_customer_rfm").collect()
    assert(rows.nonEmpty)
    def quartiles(vs: Array[Long]): (Double, Double, Double) = {
      val s = vs.sorted
      def q(p: Double): Double = {
        val pos = p * (s.length - 1)
        val lo = s(pos.toInt).toDouble
        val hi = s(math.min(pos.toInt + 1, s.length - 1)).toDouble
        lo + (pos - pos.toInt) * (hi - lo)
      }
      (q(0.25), q(0.5), q(0.75))
    }
    def grade(v: Long, q: (Double, Double, Double)): Long =
      1L + (if (v > q._1) 1 else 0) + (if (v > q._2) 1 else 0) + (if (v > q._3) 1 else 0)
    val rq = quartiles(rows.map(_.getAs[Long]("rdays")))
    val fq = quartiles(rows.map(_.getAs[Long]("frequency")))
    val mq = quartiles(rows.map(_.getAs[Long]("monetary_cents")))
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score"))
      assert(rs == grade(r.getAs[Long]("rdays"), rq))
      assert(fs == grade(r.getAs[Long]("frequency"), fq))
      assert(ms == grade(r.getAs[Long]("monetary_cents"), mq))
      assert(r.getAs[String]("segment") == s"$rs$fs$ms")
    }
    // every dimension populates more than one grade on this corpus
    assert(rows.map(_.getAs[Long]("m_score")).distinct.length >= 3)
  }

  test("q_graph_bfs matches reference multi-source hop distances") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    li.groupBy(_._1).values.foreach { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a != b)
        adj(a) = adj.getOrElse(a, Set.empty) + b
    }
    val nodes = li.map(_._2).distinct
    var dist = nodes.filter(_ % 100 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val next = dist.toSeq.flatMap { case (n, dd) =>
        adj.getOrElse(n, Set.empty).map(_ -> (dd + 1))
      }
      dist = (dist.toSeq ++ next).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val got = run("q_graph_bfs").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(got == dist)
    assert(got.values.toSet.size >= 2, "expected multiple hop distances")
  }

  test("q_multimodal_audio tiles frames exactly and recomputes energy per char") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = run("q_multimodal_audio").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == texts.keySet)
    byDoc.foreach { case (id, frames) =>
      val text = texts(id)
      // frames tile the sample stream without gap or overlap
      assert(frames.map(_.getAs[Long]("n_samples")).sum == text.length.toLong)
      assert(frames.map(_.getAs[Long]("frame")).sorted.toSeq ==
        (0L until frames.length.toLong))
      frames.foreach { f =>
        val start = f.getAs[Long]("frame").toInt * 64
        val ss = text.slice(start, start + 64)
          .map(c => { val v = (c - 32).toLong; v * v }).sum
        assert(f.getAs[Long]("ss") == ss, s"doc $id frame ${f.getAs[Long]("frame")}")
        val rms = math.sqrt(ss.toDouble / f.getAs[Long]("n_samples").toDouble)
        assert(f.getAs[Double]("rms") == rms)
        assert(f.getAs[Boolean]("is_silence") == (rms < 68.0))
      }
    }
    // the threshold actually separates classes on this corpus
    assert(rows.exists(_.getAs[Boolean]("is_silence")) &&
      rows.exists(!_.getAs[Boolean]("is_silence")))
  }

  test("q_graph_neighbors scores capped common neighbors of non-edges") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    adj.foreach { case (_, nbrs) =>
      val capped = nbrs.sorted.take(16)
      for (i <- capped.indices; j <- i + 1 until capped.length)
        counts((capped(i), capped(j))) =
          counts.getOrElse((capped(i), capped(j)), 0L) + 1
    }
    val nonEdge = counts.filterNot { case (p, _) => edges(p) }
    val rows = run("q_graph_neighbors").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val p = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(!edges(p), s"$p is an existing edge")
      assert(r.getAs[Long]("common") == nonEdge(p), s"$p")
    }
    val minShown = rows.map(_.getAs[Long]("common")).min
    assert(nonEdge.count { case (_, c) => c > minShown } <= 20,
      "top-20 must be the true head of the candidate scores")
  }

  test("q_text_hashfeatures folds words into 64 buckets with exact counts") {
    def bucket(word: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(word.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = run("q_text_hashfeatures").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == texts.keySet)
    rows.foreach { r =>
      val words = texts(r.getAs[Long]("doc_id")).split(" ")
      val expected = words.groupBy(bucket).view
        .mapValues(_.length.toLong).toMap
      assert(r.getAs[Long]("n_active") == expected.size.toLong)
      assert(r.getAs[Long]("l1_mass") == words.length.toLong)
      val csv = expected.toSeq.sortBy(_._1)
        .map { case (b, c) => s"$b:$c" }.mkString(";")
      assert(r.getAs[String]("features_csv") == csv)
    }
  }

  test("q_events_twa equals the interval-weighted reference mean") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        date_trunc("MILLISECOND", col("ts")).as("tsm"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("tsm").getTime, r.getAs[Double]("value")))
    val rows = run("q_events_twa").collect()
    val byUser = rows.map(r => r.getAs[Long]("user_id") -> r).toMap
    evs.groupBy(_._1).foreach { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      if (sorted.length < 2) assert(!byUser.contains(uid))
      else {
        val ivs = sorted.zip(sorted.tail).map { case (a, b) =>
          val v = BigDecimal(a._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          (b._3 - a._3, v)
        }
        val r = byUser(uid)
        assert(r.getAs[Long]("n_intervals") == ivs.length.toLong)
        val totalMs = ivs.map(_._1).sum
        assert(r.getAs[Long]("total_ms") == totalMs)
        val wsum = ivs.map { case (dt, v) => v * BigDecimal(dt) }.sum
        assert(r.getAs[Double]("twa_value") ==
          wsum.toDouble / totalMs.toDouble, s"user $uid")
      }
    }
  }

  test("q_emb_standardize matches the fixed-point z-score reference lane-for-lane") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val dims = vecs.head._2.length
    val n = vecs.length.toLong
    val zref = Array.tabulate(dims) { d =>
      val fx = vecs.map { case (_, v) => math.floor(v(d).toDouble * 1e8 + 0.5).toLong }
      val s = fx.sum // exact: |Σ| < 2^63 at this scale
      val ss = fx.map(x => BigInt(x) * BigInt(x)).sum
      val mean = (s.toDouble / n.toDouble) / 1e8
      val varnum = ss.toDouble - s.toDouble * s.toDouble / n.toDouble
      val sd = math.sqrt(varnum / (n - 1).toDouble) / 1e8
      (mean, sd)
    }
    // lane-per-row output (vec_id, dim, z)
    val rows = run("q_emb_standardize").collect()
    assert(rows.length == vecs.length * dims)
    val byId = vecs.toMap
    rows.foreach { r =>
      val v = byId(r.getAs[Long]("vec_id"))
      val d = r.getAs[Long]("dim").toInt
      val (mean, sd) = zref(d)
      val expected = (math.floor(v(d).toDouble * 1e8 + 0.5) / 1e8 - mean) / sd
      assert(r.getAs[Double]("z") == expected,
        s"vec ${r.getAs[Long]("vec_id")} dim $d")
    }
    // standardization did its job: per-dim z mean ~0 and std ~1
    rows.groupBy(_.getAs[Long]("dim")).foreach { case (d, lanes) =>
      val zs = lanes.map(_.getAs[Double]("z"))
      val m = zs.sum / zs.length
      val sd = math.sqrt(zs.map(x => (x - m) * (x - m)).sum / (zs.length - 1))
      assert(math.abs(m) < 1e-9 && math.abs(sd - 1.0) < 1e-9, s"dim $d: $m, $sd")
    }
  }

  test("q_agg_incremental delta-maintenance equals the direct recompute") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // direct aggregate of the staged NEW snapshot
    val direct = orders.filter(_._1 % 17 != 0)
      .map { case (k, st, p) =>
        val price = if (k % 5 == 0) p + 1.0 else p
        (st, math.floor(price * 100 + 0.5).toLong)
      }
      .groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val got = run("q_agg_incremental").collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("total_cents"))).toMap
    assert(got == direct)
  }

  test("q_sql_recursive walks every key to its forest root at digit depth") {
    val keys = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val rows = run("q_sql_recursive").collect()
      .map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("root"), r.getAs[Long]("depth"))).toMap
    // reference walk: repeated div-10 while every intermediate exists
    keys.foreach { k =>
      var (cur, depth) = (k, 0L)
      var alive = true
      while (alive && cur >= 10) {
        if (keys.contains(cur / 10)) { cur /= 10; depth += 1 }
        else alive = false
      }
      if (alive) assert(rows(k) == (cur, depth), s"key $k")
      else assert(!rows.contains(k), s"orphan chain $k should be absent")
    }
    assert(rows.size == keys.count { k =>
      Iterator.iterate(k)(_ / 10).takeWhile(_ >= 10).forall(c => keys.contains(c / 10))
    })
    // and it really executes through the native recursive operator
    import org.apache.spark.sql.execution.{SparkPlan, UnionLoopExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def loops(p: SparkPlan): Seq[UnionLoopExec] = p.collect {
      case u: UnionLoopExec => Seq(u)
      case a: AdaptiveSparkPlanExec => loops(a.executedPlan)
    }.flatten
    assert(loops(run("q_sql_recursive").queryExecution.executedPlan).nonEmpty,
      "expected UnionLoopExec in the recursive plan")
  }

  test("q_agg_hll_union rolls sketches up to the exact distinct counts") {
    val events = Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
    val collected = run("q_agg_hll_union").collect()
    val rows = collected
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users_exact")).toMap
    // the exact side must equal the true distincts, and every sketch
    // estimate must sit inside its 1% calibration band (sparse-mode
    // HLL is exact at this cardinality, so the band is loose)
    events.groupBy(_._1).foreach { case (t, es) =>
      assert(rows(t) == es.map(_._2).distinct.length.toLong, s"type $t")
    }
    assert(rows("__all__") == events.map(_._2).distinct.length.toLong)
    assert(rows.size == events.map(_._1).distinct.length + 1)
    collected.foreach(r => assert(r.getAs[Boolean]("est_within_1pct"),
      s"sketch estimate out of band: $r"))
  }

  test("q_events_engagement computes exact DAU/WAU with DAU <= WAU") {
    val userDays = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("day").getTime))
    val days = userDays.map(_._2).distinct.sorted
    val rows = run("q_events_engagement").collect()
    assert(rows.map(_.getAs[java.sql.Timestamp]("day").getTime).toSeq == days.toSeq)
    rows.foreach { r =>
      val d = r.getAs[java.sql.Timestamp]("day").getTime
      val dau = userDays.count(_._2 == d).toLong
      val wau = userDays.filter { case (_, ud) =>
        ud <= d && ud >= d - 6L * 86400000L
      }.map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau)
      assert(r.getAs[Long]("wau") == wau, s"day $d")
      assert(dau <= wau)
      assert(r.getAs[Double]("stickiness") == dau.toDouble / wau.toDouble)
    }
  }
}
