package graft

import org.apache.spark.sql.functions._

/** Semantic pins for round-10 batch 2 (the hash gate proves DuckDB
  * value equality; these pin contracts hashes can't express). */
class Round10Spec2 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_multimodal_phash_neardup equals a capped-band reference over real phashes") {
    val ph = graft.ops.Multimodal.phash(
      graft.ops.Multimodal.pngPayload(Tables.documents(spark, sf), "doc_id"),
      "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // replicate bands -> cap 16 by doc_id -> distinct pairs -> hamming<=6
    val buckets = ph.flatMap { case (id, h) =>
      (0 until 4).map(b => ((b, (h >> (b * 16)) & 0xffffL), id, h))
    }.groupBy(_._1).view.mapValues(_.sortBy(_._2).take(16)).toMap
    val want = buckets.values.flatMap { members0 =>
      val members = members0.toSeq
      for {
        a <- members; b <- members
        if a._2 < b._2 && java.lang.Long.bitCount(a._3 ^ b._3) <= 6
      } yield (a._2, b._2, java.lang.Long.bitCount(a._3 ^ b._3).toLong)
    }.toSet
    val got = run("q_multimodal_phash_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.nonEmpty, "fixture images include near-identical gradients")
  }

  test("q_mix_temperature shares sum to 1 and upsample smaller sources") {
    val rows = run("q_mix_temperature").collect()
    assert(rows.length > 1)
    val shareSum = rows.map(_.getAs[Double]("temp_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-12, s"Σ temp_share = $shareSum")
    // α < 1 flattens: below-average sources gain, above-average lose
    val meanP = 1.0 / rows.length
    rows.foreach { r =>
      val p: Double = r.getAs[Double]("p")
      val up: Double = r.getAs[Double]("upsample_factor")
      if (p < meanP) assert(up > 1.0, s"${r.getString(0)}: small source must upsample")
      if (p > meanP) assert(up < 1.0, s"${r.getString(0)}: big source must downsample")
    }
  }

  test("q_emb_hamming: ranks ordered, and hamming-selected hits beat the corpus mean cosine") {
    val rows = run("q_emb_hamming").collect()
    assert(rows.length == 30) // 3 queries × top-10
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, hits) =>
      val sorted = hits.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
      // hamming non-decreasing with rank
      val hs = sorted.map(_.getAs[Long]("hamming"))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, s"q=$q: $hs")
      // sign-bit hamming is angle-correlated: the selected 10 should
      // average a much higher cosine than a random vector pair (~0)
      val meanCos = sorted.map(_.getAs[Double]("cos")).sum / 10.0
      assert(meanCos > 0.1, s"q=$q: mean cos of hamming top-10 = $meanCos")
    }
  }

  test("q_dedup_cross_sources equals a collected overlap reference") {
    val docs = Tables.documents(spark, sf)
      .select(substring(col("text"), 1, 256).as("p"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def digest(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val perSource = docs.groupBy { case (p, src) => (digest(p), src) }
      .view.mapValues(_.length).toMap
    val want = perSource.keys.groupBy(_._1).values.flatMap { ks =>
      val srcs = ks.map(_._2).toSeq.sorted
      for {
        s1 <- srcs; s2 <- srcs
        if s1 < s2 || (s1 == s2 && perSource((ks.head._1, s1)) >= 2)
        if s1 <= s2
      } yield (s1, s2)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q_dedup_cross_sources").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, s"missing=${(want.keySet -- got.keySet).take(5)} " +
      s"extra=${(got.keySet -- want.keySet).take(5)}")
  }

  test("q_similarity_recall_sweep: recall and cost both rise monotonically with nprobe") {
    val rows = run("q_similarity_recall_sweep").collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val scored = rows.map(_.getAs[Long]("n_scored"))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(scored.zip(scored.tail).forall { case (a, b) => a < b },
      s"cost must grow with nprobe: ${scored.toSeq}")
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"nested candidate sets: recall can't drop: ${hits.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_at_10") ==
        r.getAs[Long]("n_hits").toDouble / 50.0)
    }
    // the index is useful at all: majority recall even at nprobe=1
    assert(hits.head >= 25, s"nprobe=1 recall collapsed: ${hits.head}/50")
  }

  test("q_emb_cluster_quality: sizes partition the corpus, shares sum to 1, SSE consistent") {
    val rows = run("q_emb_cluster_quality").collect()
    assert(rows.length == 8)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    val shareSum = rows.map(_.getAs[Double]("inertia_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"Σ shares = $shareSum")
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_sq_dist") ==
        r.getAs[Long]("sse_fp").toDouble / 1e8 / r.getAs[Long]("n").toDouble)
      assert(r.getAs[Long]("sse_fp") >= 0L && r.getAs[Long]("n") > 0L)
    }
  }

  test("q_stats_ttest equals a collected Welch reference") {
    val vals = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def stats(seg: String): (Long, Double, Double) = {
      val xs = vals.filter(_._1 == seg).map(_._2)
      val n = xs.length.toLong
      val sv = xs.sum
      val ss = xs.map(x => BigInt(x) * BigInt(x)).sum
      val mean = sv.toDouble / n.toDouble / 100.0
      val varc = (ss.toDouble - sv.toDouble * sv.toDouble / n.toDouble) /
        (n - 1).toDouble / 10000.0
      (n, mean, varc)
    }
    val (n1, m1, v1) = stats("BUILDING")
    val (n2, m2, v2) = stats("MACHINERY")
    val (se1, se2) = (v1 / n1.toDouble, v2 / n2.toDouble)
    val r = run("q_stats_ttest").collect().head
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Double]("m1") == m1 && r.getAs[Double]("m2") == m2)
    assert(r.getAs[Double]("t_stat") == (m1 - m2) / math.sqrt(se1 + se2))
    val df = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (n1 - 1).toDouble + se2 * se2 / (n2 - 1).toDouble)
    assert(r.getAs[Double]("df_welch") == df)
    // Welch df lies between min(n)-1 and n1+n2-2
    assert(df >= math.min(n1, n2) - 1.0 && df <= (n1 + n2 - 2).toDouble)
  }

  test("q_text_fertility: fertility >= 1 and chars/token positive per language") {
    val rows = run("q_text_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the subtoken regex splits words further, never merges them
      assert(r.getAs[Double]("tokens_per_word") >= 1.0, r.getString(0))
      assert(r.getAs[Double]("chars_per_token") > 0.0, r.getString(0))
      assert(r.getAs[Long]("n_subtokens") >= r.getAs[Long]("n_words"))
    }
  }

  test("q_events_forecast_snaive equals a collected-reference computation") {
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).getTime), r.getLong(2)))
      .toMap
    val ref: Map[String, (Long, Long, Long)] = hourly.toSeq.flatMap { case ((t, h), c) =>
      for {
        cw <- hourly.get((t, h - 168L * 3600 * 1000))
        ch <- hourly.get((t, h - 3600 * 1000L))
      } yield (t, math.abs(c - cw), math.abs(c - ch))
    }.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
    }.toMap
    val got = run("q_events_forecast_snaive").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val (n: Long, sw: Long, sh: Long) = ref(t)
      assert(r.getAs[Long]("n_eval") == n, s"$t n_eval")
      assert(r.getAs[Double]("mae_snaive") == sw.toDouble / n.toDouble, s"$t snaive")
      assert(r.getAs[Double]("mae_naive1") == sh.toDouble / n.toDouble, s"$t naive1")
      if (sh == 0L) assert(r.isNullAt(r.fieldIndex("rel_mase")), s"$t mase null")
      else assert(r.getAs[Double]("rel_mase") == sw.toDouble / sh.toDouble, s"$t mase")
    }
    assert(got.length == ref.size)
  }
}
