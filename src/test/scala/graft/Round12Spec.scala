package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Round-12 batch 1: VARIANT ingestion (q_json_variant,
  * q_json_variant_nested). */
class Round12Spec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectAll(q.plan)(pf)
    }.flatten
    here ++ nested
  }

  test("q_json_variant: scan prunes to (event_type, props); extraction matches a direct regex parse") {
    val df = SparkEntry.queries("q_json_variant")(spark, sf)
    val scans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s.metadata("ReadSchema") }
    assert(scans.nonEmpty)
    scans.foreach { rs =>
      assert(rs.contains("event_type") && rs.contains("props"), rs)
      assert(!rs.contains("user_id") && !rs.contains("value") && !rs.contains("ts"),
        s"variant rollup must not read unused columns: $rs")
    }
    // brute: the corpus's props are exactly {"k": N} — regex-extract and
    // recompute the rollup without any variant machinery
    val brute = Tables.events(spark, sf)
      .select(col("event_type"),
        regexp_extract(col("props"), "\\d+", 0).cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        countDistinct(col("k")).as("n_k"),
        sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_hi"))
      .orderBy("event_type")
    assert(df.collect().toSeq == brute.collect().toSeq)
  }

  test("q_json_variant_nested: the variant roundtrip is the identity on every leaf") {
    val out = SparkEntry.queries("q_json_variant_nested")(spark, sf)
    val direct = Tables.events(spark, sf)
      .filter(col("event_id") < 100)
      .select(col("event_id"), col("user_id").as("u"),
        col("event_type").as("t"),
        floor(col("value") * 100 + 0.5).cast("long").as("mv"),
        (regexp_extract(col("props"), "\\d+", 0).cast("long") * 2).as("a1"))
      .orderBy("event_id")
    assert(out.collect().toSeq == direct.collect().toSeq)
    assert(out.count() == 100)
  }

  test("variant rollup streaming twin: append-mode == batch on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 120).map { i =>
      (new java.sql.Timestamp(base.getTime + i * 5 * 60 * 1000L),
        if (i % 2 == 0) "click" else "view", s"""{"k": ${i % 17}}""")
    }
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val q = graft.streaming.EventStreams.variantRollup(
        mem.toDF().toDF("ts", "event_type", "props"), watermark = "1 minute")
      .writeStream.format("memory").queryName("variant_out")
      .outputMode("append").start()
    mem.addData(rows)
    q.processAllAvailable()
    // advance the watermark past every window, then flush
    mem.addData((java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "late", """{"k": 0}"""))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("variant_out")
      .filter(col("event_type").isin("click", "view"))
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = graft.streaming.EventStreams.variantRollup(
        rows.toDF("ts", "event_type", "props"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("q_stats_anova matches a driver-side brute-force recomputation") {
    val out = SparkEntry.queries("q_stats_anova")(spark, sf).head()
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), floor(col("o_totalprice") * 100 + 0.5)
        .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val k = groups.size
    val n = rows.length
    val sAll = rows.map(_._2.toDouble).sum
    val ssqAll = rows.map(r => r._2.toDouble * r._2.toDouble).sum
    val sbRaw = groups.map { case (_, g) =>
      val s = g.map(_._2.toDouble).sum; s * s / g.size }.sum
    val ssb = (sbRaw - sAll * sAll / n) / 1e4
    val ssw = (ssqAll - sbRaw) / 1e4
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(out.getAs[Long]("k") == k && out.getAs[Long]("n") == n)
    assert(math.abs(out.getAs[Double]("f_stat") - f) / f < 1e-9,
      s"F ${out.getAs[Double]("f_stat")} vs brute $f")
    val eta = out.getAs[Double]("eta_sq")
    assert(eta > 0 && eta < 1)
  }

  test("q_stats_kruskal matches a driver-side brute-force midrank recomputation") {
    val out = SparkEntry.queries("q_stats_kruskal")(spark, sf).head()
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = rows.length
    // midranks: for each distinct value, mean rank of its tie block
    val byV = rows.groupBy(_._1).view.mapValues(_.length).toSeq.sortBy(_._1)
    var below = 0L
    val mid = byV.map { case (v, t) =>
      val m = below + (t + 1) / 2.0; below += t; v -> m }.toMap
    val rSum = rows.groupBy(_._2).view
      .mapValues(_.map(r => mid(r._1)).sum).toMap
    val nG = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val h = 12.0 / (n.toDouble * (n + 1)) *
      rSum.map { case (g, r) => r * r / nG(g) }.sum - 3.0 * (n + 1)
    val tie = 1.0 - byV.map { case (_, t) =>
      t.toDouble * t * t - t }.sum / (n.toDouble * n * n - n)
    assert(out.getAs[Long]("n") == n)
    assert(math.abs(out.getAs[Double]("h_stat") - h) / h < 1e-9,
      s"H ${out.getAs[Double]("h_stat")} vs brute $h")
    assert(math.abs(out.getAs[Double]("tie_c") - tie) < 1e-12)
    assert(out.getAs[Double]("h_corrected") > out.getAs[Double]("h_stat"),
      "tie correction must increase H (C < 1 with ties present)")
  }

  test("q_feature_target_encoding: leave-one-out recomputation + leakage direction") {
    val out = SparkEntry.queries("q_feature_target_encoding")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_orderstatus") === "F").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gy = rows.map(_._2).sum.toDouble
    val gn = rows.length.toDouble
    for (((cat, y), (nCy, nC, te)) <- out) {
      val g = rows.filter(_._1 == cat)
      assert(g.size == nC && g.count(_._2 == y) == nCy)
      val brute = ((g.map(_._2).sum - y).toDouble + 20.0 * gy / gn) /
        (g.size - 1.0 + 20.0)
      assert(math.abs(te - brute) < 1e-12, s"($cat,$y): $te vs $brute")
    }
    // leakage guard direction: for the same category, the y=1 row's
    // encoding must be LOWER than the y=0 row's (its own positive label
    // is excluded from its numerator)
    out.keys.map(_._1).toSeq.distinct.foreach { cat =>
      (out.get((cat, 0L)), out.get((cat, 1L))) match {
        case (Some((_, _, te0)), Some((_, _, te1))) => assert(te1 < te0)
        case _ =>
      }
    }
  }

  test("q_emb_randproj: JL distortion concentrates near 1 over the eval pairs") {
    val rows = SparkEntry.queries("q_emb_randproj")(spark, sf).collect()
    assert(rows.length == 40 * 39 / 2)
    val ds = rows.map(_.getAs[Double]("distortion"))
    assert(ds.forall(x => !x.isNaN && x > 0))
    // E[d16²/d64²] = 1 for a ±1/√k projection; k = 16 gives sd ≈ 1/√8,
    // so the MEAN of squared distortion over 780 pairs sits well inside
    // [0.8, 1.2] — this is the JL calibration a pipeline records
    val meanSq = ds.map(x => x * x).sum / ds.length
    assert(meanSq > 0.8 && meanSq < 1.2, s"mean squared distortion $meanSq")
  }

  test("q_similarity_ndcg: ndcg in (0,1], idcg is the closed-form constant, dcg <= idcg") {
    val rows = SparkEntry.queries("q_similarity_ndcg")(spark, sf).collect()
    assert(rows.length == 3)
    val idcgBrute = (1 to 10).map(d0 =>
      (11 - d0).toDouble / (math.log(d0 + 1.0) / math.log(2.0))).sum
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"),
        r.getAs[Double]("idcg"), r.getAs[Double]("ndcg"))
      assert(math.abs(idcg - idcgBrute) < 1e-9)
      // dcg = 0 is legitimate: at tiny corpora a sketch top-10 can be
      // fully disjoint from the full top-10 (zero graded relevance)
      assert(dcg >= 0 && dcg <= idcg + 1e-12)
      assert(ndcg >= 0 && ndcg <= 1.0 + 1e-12)
    }
    assert(rows.exists(_.getAs[Double]("ndcg") > 0),
      "at least one query's sketch ranking should retrieve relevant docs")
  }

  test("q_feature_woe_iv: brute recomputation; IV total positive; marginals reconcile") {
    val out = SparkEntry.queries("q_feature_woe_iv")(spark, sf).collect()
    val per = out.filter(_.getLong(0) >= 0)
    val tot = out.filter(_.getLong(0) == -1L).head
    assert(per.map(_.getLong(1)).sum == tot.getLong(1) &&
      per.map(_.getLong(2)).sum == tot.getLong(2))
    val gt = tot.getLong(1).toDouble
    val bt = tot.getLong(2).toDouble
    var iv = 0.0
    per.foreach { r =>
      val (g, b) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val woe = math.log((g * bt) / (b * gt))
      assert(math.abs(r.getAs[Double]("woe") - woe) < 1e-9)
      iv += (g / gt - b / bt) * woe
    }
    assert(math.abs(tot.getAs[Double]("iv_term") - iv) < 1e-9)
    assert(tot.getAs[Double]("iv_term") >= 0,
      "IV is a sum of (p-q)*ln(p/q) terms, each non-negative")
  }

  test("q_similarity_mrr_map: brute recomputation from the two collected rankings") {
    graft.functions.CosineSimExpr.register(spark)
    val out = SparkEntry.queries("q_similarity_mrr_map")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (dp, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def dot8(a: Array[Float], b: Array[Float]): Double =
      (0 until 8).map(i => a(i).toDouble * b(i)).sum
    var (srr, sap) = (0.0, 0.0)
    for (qid <- 0L until 3L) {
      val qv = e(qid)
      def top10(score: Array[Float] => Double): Seq[Long] =
        e.toSeq.filter(_._1 != qid)
          .map { case (id, v) => (id, score(v)) }
          .sortBy { case (id, s0) => (-s0, id) }.take(10).map(_._1)
      val full = top10(v => cos(qv, v)).toSet
      val sk = top10(v => dot8(qv, v))
      val rels = sk.zipWithIndex.map { case (id, i) => (i + 1, full(id)) }
      val rr = rels.find(_._2).map(p => 1.0 / p._1).getOrElse(0.0)
      val nRel = rels.count(_._2)
      val ap = if (nRel == 0) 0.0 else
        rels.filter(_._2).map { case (rk, _) =>
          rels.count(p => p._2 && p._1 <= rk).toDouble / rk }.sum / nRel
      val (orr, oap) = out(qid)
      assert(math.abs(orr - rr) < 1e-12, s"q$qid rr $orr vs $rr")
      assert(math.abs(oap - ap) < 1e-12, s"q$qid ap $oap vs $ap")
      srr += rr; sap += ap
    }
    val (mrr, map) = out(-1L)
    assert(math.abs(mrr - srr / 3) < 1e-12 && math.abs(map - sap / 3) < 1e-12)
  }

  test("variant columns round-trip through parquet and extract after re-read") {
    // the lakehouse path: land VARIANT in parquet, read it back, extract
    // typed paths — proves the storage plumbing, not just in-memory exprs
    val tmp = java.nio.file.Files.createTempDirectory("graft-variant").toString
    Tables.events(spark, sf)
      .select(col("event_id"), expr("parse_json(props)").as("pv"))
      .write.mode("overwrite").parquet(s"$tmp/ev_variant.parquet")
    val back = spark.read.parquet(s"$tmp/ev_variant.parquet")
    assert(back.schema("pv").dataType.typeName == "variant")
    val got = back
      .select(col("event_id"), expr("variant_get(pv, '$.k', 'bigint')").as("k"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Tables.events(spark, sf)
      .select(col("event_id"),
        regexp_extract(col("props"), "\\d+", 0).cast("long").as("k"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_split_kfold: folds partition the corpus; shares balanced near 1/k; assignment stable") {
    val out = SparkEntry.queries("q_split_kfold")(spark, sf).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, sf).count())
    assert(out.map(_.getLong(0)).distinct.sorted.toSeq == (0L to 4L),
      "all 5 folds must be populated")
    // stratification: each fold's share of each label near 1/k = 0.2
    out.foreach { r =>
      val share = r.getAs[Double]("label_share")
      assert(share > 0.1 && share < 0.3,
        s"fold ${r.getLong(0)} label ${r.getString(1)} share $share")
    }
    // determinism: identical second run
    val again = SparkEntry.queries("q_split_kfold")(spark, sf).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("schema_of_variant sees the nested document's full structure") {
    val one = Tables.events(spark, sf).filter(col("event_id") === 0)
      .select(expr(
        """schema_of_variant(parse_json(
          |  to_json(struct(user_id AS u,
          |    struct(event_type AS t, 5L AS v) AS m,
          |    array(1L, 2L) AS a))))""".stripMargin).as("sch"))
      .head().getString(0)
    assert(one.contains("ARRAY") && one.contains("BIGINT") && one.contains("STRING"),
      s"unexpected variant schema: $one")
  }
}
