package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.ops.{Dedup, Multimodal, TextAnalysis}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "dog lazy the over jumps fox brown quick the"),   // same word SET as 1
    (4L, "completely different tokens appear in this one"),
    (5L, "the quick brown fox sleeps under the lazy dog")  // near dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val got = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id").collect()
    assert(got.length == 4)
    val first = got.head
    assert(first.getAs[Long]("keep_id") == 1L && first.getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH finds word-set duplicates with jaccard 1.0") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text", 16, 4, 0.9)
      .orderBy("d1", "d2").collect()
    val keys = pairs.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)) && keys.contains((2L, 3L)))
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.9))
    assert(!keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("bucket cap bounds minhash candidates on a skewed shingle corpus") {
    // Adversarial shape: 60 DISTINCT word sets that are near-identical
    // (40 shared words + 1 unique), so almost every pair collides in ≥1
    // band and uncapped LSH degenerates toward bucket² — C(60,2) ≈ 1770
    // verified pairs. With bucketCap=5 each (band, bucket) admits only
    // the 5 sets with smallest representative id, so candidate volume is
    // bounded per bucket regardless of how skewed the distribution is.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val skewed = (1 to 60).map(i => (i.toLong, s"$base u$i")).toDF("doc_id", "text")
    val uncapped = Dedup.minHashPairs(skewed, "doc_id", "text", 16, 4, 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minHashPairs(skewed, "doc_id", "text", 16, 4, 0.9,
        bucketCap = 5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size > 500, s"skew corpus should explode uncapped: ${uncapped.size}")
    assert(capped.size <= 100, s"cap must bound candidates: ${capped.size}")
    assert(capped.subsetOf(uncapped), "cap may only REMOVE pairs, never invent them")
    // the five smallest reps are admitted to every bucket they touch, so
    // all pairs among docs 1..5 survive the cap
    val lowIds = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)).toSet
    assert(lowIds.subsetOf(capped), s"smallest-rep pairs must survive: $capped")
  }

  test("paragraph dedup keeps first instance, reassembles in order, drops emptied docs") {
    val pd = Seq(
      (1L, "alpha beta\n\ncommon boiler\n\ngamma delta"),
      (2L, "common boiler\n\nepsilon zeta"),   // first para seen in doc 1
      (3L, "common boiler"),                   // ONLY boilerplate → vanishes
      (4L, "alpha beta\n\nalpha beta")         // self-duplicate: keep pos 0 only
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(pd, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "alpha beta\n\ncommon boiler\n\ngamma delta", 3L),
      (2L, "epsilon zeta", 1L)))
    // doc 3 fully deduped away; doc 4's paragraphs were all first seen in doc 1
  }

  test("connected components merge transitive near-dup chains") {
    val words = (1 to 20).map(i => s"w$i")
    val t1 = words.mkString(" ")                              // {w1..w20}
    val t2 = (words.drop(1) :+ "x1").mkString(" ")            // j(1,2)=19/21≈0.905
    val t3 = (words.drop(2) :+ "x1" :+ "x2").mkString(" ")    // j(2,3)≈0.905, j(1,3)≈0.82
    val t4 = (1 to 20).map(i => s"z$i").mkString(" ")         // unrelated
    val chain = Seq((10L, t1), (11L, t2), (12L, t3), (13L, t4)).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minHashPairs(chain, "doc_id", "text", 16, 4, 0.9)
    val keys = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((10L, 11L)) && keys.contains((11L, 12L)))
    assert(!keys.contains((10L, 12L)))  // not directly similar enough
    val cc = graft.ops.Dedup.connectedComponents(
      chain.select(col("doc_id").as("node")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(10L) == 10L && cc(11L) == 10L && cc(12L) == 10L)  // transitive
    assert(cc(13L) == 13L)                                      // singleton
  }

  test("connected components converge on a long path graph (pointer-jump path)") {
    // a 60-node path is the worst case for per-hop propagation — the min
    // label must travel the full diameter; pointer jumping must still
    // reach the exact fixpoint (all labels = 1) within maxIters=20
    val nodes = (1L to 60L).toDF("node")
    val pathPairs = (1L until 60L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = graft.ops.Dedup.connectedComponents(nodes, pathPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 60 && got.forall(_._2 == 1L),
      s"all nodes must label to 1: ${got.filter(_._2 != 1L).take(5).toSeq}")
    // two disjoint paths keep distinct labels
    val nodes2 = (1L to 10L).toDF("node")
    val twoPaths = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++
      Seq((6L, 7L), (7L, 8L), (8L, 9L), (9L, 10L))).toDF("d1", "d2")
    val got2 = graft.ops.Dedup.connectedComponents(nodes2, twoPaths)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 5L).forall(got2(_) == 1L) && (6L to 10L).forall(got2(_) == 6L))
  }

  test("digest-level dedupClusters equals doc-level CC over minHashPairs") {
    // the scale shortcut (CC over digest reps, members expanded at the
    // end) must be label-for-label identical to running CC on the full
    // doc-level pair graph — same components, same min-doc_id reps
    val corpus = Tables.documents(spark, sf)
    val pairs = Dedup.minHashPairs(corpus, "doc_id", "text", 16, 4, 0.9)
    val docLevel = Dedup.connectedComponents(
      corpus.select(col("doc_id").as("node")), pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val digestLevel = Dedup.dedupClusters(corpus, "doc_id", "text", 16, 4, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(digestLevel.size == docLevel.size)
    val diffs = docLevel.collect {
      case (d, lbl) if digestLevel(d) != lbl => (d, lbl, digestLevel(d)) }
    assert(diffs.isEmpty, s"label mismatches: ${diffs.take(5)}")
  }

  test("simhash: identical texts get identical fingerprints, hamming 0") {
    val fp = Dedup.simHash64(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(4L))
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", 0).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("hamming")))
    assert(pairs.exists { case (d1, d2, h) => d1 == 1L && d2 == 2L && h == 0L })
  }

  test("simhash is deterministic across runs") {
    val a = Dedup.simHash64(docs, "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = Dedup.simHash64(docs, "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("cosine similarity: self = 1, orthogonal = 0") {
    val df = Seq((Array(1f, 0f, 2f), Array(1f, 0f, 2f), Array(0f, 3f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("sign buckets quantize by sign of leading dims") {
    val df = Seq(
      (1L, Array(1f, 1f, -1f, 1f)),
      (2L, Array(1f, 1f, -1f, 1f)),
      (3L, Array(-1f, -1f, 1f, -1f))).toDF("id", "v")
    val got = df.select(col("id"), Similarity.signBucket(col("v"), 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(1L) != got(3L))
    assert(got(1L) == (1 | 2 | 8))
  }

  test("langid picks the language with most marker hits; und when none") {
    val df = Seq("the cat and the hat", "el gato que canta la los", "zzz yyy")
      .toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "und"))
  }

  test("PNG codec round trip: decode(makePng) reproduces the pixel formula") {
    // PNG is lossless, so a real javax.imageio encode → decode must give
    // back exactly the fixture pixels: (x*31 + y*7 + c*13 + seed) mod 256.
    val (seed, w, h) = (7L, 5, 4)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    val (gw, gh, gc, gsum) = Multimodal.decodePng(reader, Multimodal.makePng(seed, w, h))
    val want = (for { x <- 0 until w; y <- 0 until h; c <- 0 until 3 }
      yield (x * 31L + y * 7L + c * 13L + seed) % 256).sum
    assert((gw, gh, gc, gsum) == (w, h, 3, want))
  }

  test("sign-bucket ANN recall@3 vs brute force: chance-level on random embeddings") {
    // Honest eval of the approximate path on THIS corpus: the synthetic
    // embeddings are near-random, so a true top-3 neighbor lands in the
    // same 4-bit sign bucket about as often as any vector does — recall
    // ≈ 1/2^4. On real (clustered) embeddings neighbors correlate and
    // sign-LSH recall rises far above chance; for isotropic data the
    // IVF/multi-probe variants are the right dial. Both sides are
    // deterministic, so the measured value is a stable pin: it documents
    // the regime, and a silent drop to zero (broken bucketing) or a jump
    // to 1.0 (accidental exact path) would both fail.
    import graft.functions.Similarity
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        Similarity.signBucket(col("embedding"), 4).as("q_bucket"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    def top3(joined: org.apache.spark.sql.DataFrame) = joined
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "neighbor_id")
    val exact = top3(e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id")))
    val ann = top3(e.withColumn("bucket", Similarity.signBucket(col("embedding"), 4))
      .join(broadcast(q), col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("q_id")))
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / exact.count()
    assert(recall > 0.0 && recall < 0.5,
      s"ANN recall@3 = $recall — expected chance-level (≈1/16) on random embeddings")

    // multi-TABLE LSH (4 tables over disjoint 4-dim slices): table 0 IS
    // the single-bucket hash, so its candidate set is a strict superset —
    // recall can only improve, and expected coverage rises from 1/16 to
    // 1-(15/16)^4 ≈ 0.23. Pin the ordering plus a sane band.
    val tabBuckets = array((0 until 4).map(t =>
      Similarity.signBucketAt(col("embedding"), 4, t * 4)): _*)
    val eT = e.select(col("vec_id"), col("embedding"), posexplode(tabBuckets))
      .toDF("vec_id", "embedding", "tbl", "bucket")
    val qT = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        posexplode(tabBuckets))
      .toDF("q_id", "q_emb", "q_tbl", "q_bucket")
    val multi = top3(eT.join(broadcast(qT),
        col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id", "embedding", "q_emb").distinct())
    val hitM = exact.intersect(multi).count()
    val recallM = hitM.toDouble / exact.count()
    assert(recallM >= recall,
      s"multi-table recall $recallM must be ≥ single-bucket $recall (superset)")
    assert(recallM > 0.05 && recallM < 0.7,
      s"multi-table recall@3 = $recallM — expected ≈0.23 coverage on random embeddings")
  }

  test("merge upsert: whole-row replace, insert, passthrough — nulls included") {
    val base = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, Some("c"), 30L))
      .toDF("k", "v", "n")
    val updates = Seq((2L, Option.empty[String], 99L),  // update to NULL must win
                      (4L, Some("d"), 40L))             // insert
      .toDF("k", "v", "n")
    val got = graft.ops.Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, Some("a"), 10L),   // passthrough
      (2L, None, 99L),        // whole-row replace — null column NOT coalesced away
      (3L, Some("c"), 30L),
      (4L, Some("d"), 40L))) // insert
    val e = intercept[IllegalArgumentException] {
      graft.ops.Merge.upsert(base, updates.select("v", "k", "n"), Seq("k"))
    }
    assert(e.getMessage.contains("schemas must match"))
  }

  test("approx_count_distinct stays within 5% of exact on the q_agg_approx groups") {
    // q_agg_approx is rows-only at the driver gate (per-engine HLL
    // sketches differ) — this pins its accuracy claim quantitatively:
    // default rsd = 0.05, so each group's estimate must sit within ±5%
    // of the exact distinct count (the same data the query runs on).
    val li = Tables.lineitem(spark, sf)
    val both = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        countDistinct(col("l_suppkey")).as("exact_supps"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val flag = r.getString(0)
      val (ap, ep) = (r.getLong(1), r.getLong(2))
      val (as_, es) = (r.getLong(3), r.getLong(4))
      assert(math.abs(ap - ep).toDouble / ep <= 0.05,
        s"$flag parts: approx=$ap exact=$ep off by ${math.abs(ap - ep).toDouble / ep}")
      assert(math.abs(as_ - es).toDouble / es <= 0.05,
        s"$flag supps: approx=$as_ exact=$es off by ${math.abs(as_ - es).toDouble / es}")
    }
  }

  test("trained-IVF recall@5 beats untrained chance by concentrating neighbors") {
    // k-means training is what turns IVF from chance-level (nprobe/K =
    // 2/8 on random data with arbitrary centroids) into a usable index:
    // Lloyd's iterations pull co-located vectors into the same list, so
    // most true top-5 neighbors land in the 2 probed lists. Both sides
    // are deterministic — the measured recall is a stable pin.
    import graft.functions.Similarity
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "neighbor_id")
    val trained = SparkEntry.queries("q_similarity_ivf_trained")(spark, sf)
      .select("q_id", "neighbor_id")
    val hit = exact.intersect(trained).count()
    val recall = hit.toDouble / exact.count()
    assert(recall >= 0.5,
      s"trained-IVF recall@5 = $recall — expected well above nprobe/K = 0.25")
  }

  test("PQ ADC top-3 recall vs exact L2 is well above chance") {
    // ADC ranks by quantized distances, so recall < 1.0 by construction,
    // and THIS corpus is PQ's worst case: near-isotropic random vectors
    // have no cluster structure for the sub-quantizers to exploit, so
    // 8 subspaces × 4 centroids retain only coarse geometry (measured
    // recall@3 = 0.27 — ~44× above the 3/(N-1) ≈ 0.006 chance level;
    // real embedding corpora cluster and recall rises sharply, and the
    // production dial is pqK, traded against code size). Both sides are
    // deterministic; the measured value is a stable pin.
    import graft.functions.Similarity
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("qid")
      .orderBy(col("dist").asc, col("neighbor_id").asc)
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        Similarity.l2sq(col("embedding"), col("q_emb")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("qid", "neighbor_id")
    val pq = SparkEntry.queries("q_similarity_pq")(spark, sf)
      .select(col("qid"), col("vec_id").as("neighbor_id"))
    val recall = exact.intersect(pq).count().toDouble / exact.count()
    val n = e.count()
    assert(recall >= 0.2 && recall > 20.0 * 3.0 / (n - 1),
      s"PQ recall@3 = $recall — expected well above chance ${3.0 / (n - 1)}")
  }

  test("exact re-rank lifts IVFPQ recall@3 above plain ADC ranking") {
    // The re-rank stage exists to recover what ADC quantization loses:
    // within the IVF-probed candidate set, scoring the top-10 ADC
    // survivors with the exact cosine must find at least every true
    // neighbor plain IVFPQ's top-3 found (the re-rank only ever fixes
    // ADC mis-orderings inside the survivor set, because ADC@10 ⊇
    // ADC@3), and on this corpus it strictly improves. Both pipelines
    // are deterministic — the comparison is a stable pin.
    import graft.functions.Similarity
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("qid", "neighbor_id")
    def recallOf(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, sf)
        .select(col("qid"), col("vec_id").as("neighbor_id"))
      exact.intersect(got).count().toDouble / exact.count()
    }
    val plain = recallOf("q_similarity_ivfpq")
    val reranked = recallOf("q_similarity_ivfpq_rerank")
    assert(reranked > plain,
      s"re-rank recall@3 = $reranked must beat plain IVFPQ's $plain")
    assert(reranked >= 0.4,
      s"re-rank recall@3 = $reranked — expected a solid lift on this corpus")
  }

  test("semantic dedup drops exactly the anchor-flagged near-dups (capped keep-first)") {
    // The anchor-capped keep-first rule's defining properties, recomputed
    // with the exact cosine HOF (not the query's native expression) and an
    // independently-derived anchor set: a vector is dropped IFF some
    // same-cluster anchor (one of the semCap smallest ids) with a smaller
    // id sits at cosine >= threshold. (1) COMPLETENESS: no kept vector is
    // anchor-flagged — in particular any kept pair whose smaller member
    // is an anchor is NOT a near-dup, the capped form of the independent-
    // set property. (2) SOUNDNESS: every dropped vector is anchor-flagged
    // (the reason it was dropped really exists).
    import graft.functions.Similarity
    import graft.queries.LlmOps4
    val kept = SparkEntry.queries("q_dedup_semantic")(spark, sf)
    val assigned = LlmOps4.semanticAssigned(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cid").orderBy("vec_id")
    val anchors = assigned.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= LlmOps4.semCap)
      .select(col("cid"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val flagged = anchors.join(
        assigned.select(col("cid"), col("vec_id").as("v2"),
          col("embedding").as("e2")), Seq("cid"))
      .filter(col("v1") < col("v2"))
      .filter(Similarity.cosine(col("e1"), col("e2")) >= LlmOps4.semThreshold)
      .select(col("v2").as("vec_id")).distinct()
    val keptFlagged = kept.join(flagged, Seq("vec_id"), "left_semi").count()
    assert(keptFlagged == 0, s"$keptFlagged kept vectors have an anchor near-dup")
    val dropped = assigned.select("vec_id")
      .join(kept.select("vec_id"), Seq("vec_id"), "left_anti")
    val unexplained = dropped.join(flagged, Seq("vec_id"), "left_anti").count()
    assert(unexplained == 0, s"$unexplained dropped vectors lack an anchor reason")
    val droppedCount = dropped.count()
    assert(droppedCount > 0, "corpus has >= threshold-cosine pairs; something must drop")
    assert(kept.count() + droppedCount == assigned.count())
  }

  test("kmeans assignment: broadcast-join min_by path equals the literal path") {
    // The large-K scale path (assignJoin: broadcast centroid frame +
    // partial-agg min_by) must assign every vector to the same centroid
    // as the literal-inlined argmin it replaces above joinAssignK —
    // including ties, which both sides break toward the smaller cid.
    import graft.queries.LlmOps4
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = LlmOps4.trainedCentroids(spark, sf)
    val viaLit = LlmOps4.assign(spark, e, cents).select("vec_id", "cid")
    val viaJoin = LlmOps4.assign(spark, e, cents, forceJoin = true)
      .select("vec_id", "cid")
    assert(viaJoin.count() == viaLit.count())
    assert(viaLit.except(viaJoin).count() == 0 &&
      viaJoin.except(viaLit).count() == 0,
      "join-path assignment diverged from the literal path")
  }

  test("approx_percentile stays within 1% of the exact percentile per group") {
    // q_agg_percentile_approx is rows-only at the driver gate (per-engine
    // sketch layouts differ) — this pins its accuracy claim: with
    // accuracy=10000 the GK sketch's rank error is ≤ n/10000, which on
    // these group sizes must land the returned value within 1% of the
    // exact interpolated percentile (relative, with an absolute floor for
    // near-zero quantities).
    val li = Tables.lineitem(spark, sf)
    val both = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("am"),
        expr("percentile(l_quantity, 0.5)").as("em"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("a9"),
        expr("percentile(l_quantity, 0.9)").as("e9"),
        expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("ap"),
        expr("percentile(l_extendedprice, 0.25)").as("ep"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val flag = r.getString(0)
      def ck(a: Double, e: Double, what: String): Unit =
        assert(math.abs(a - e) <= math.max(0.01 * math.abs(e), 1.0),
          s"$flag $what: approx=$a exact=$e")
      ck(r.getDouble(1), r.getDouble(2), "median_qty")
      ck(r.getDouble(3), r.getDouble(4), "p90_qty")
      ck(r.getDouble(5), r.getDouble(6), "p25_price")
    }
  }

  test("ops tolerate empty inputs: empty in, empty out, no exceptions") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashPairs(emptyDocs, "doc_id", "text", 16, 4, 0.9).count() == 0)
    assert(Dedup.minHashPairs(emptyDocs, "doc_id", "text", 16, 4, 0.9,
      bucketCap = 4).count() == 0)
    assert(Dedup.paragraphDedup(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simHash64(emptyDocs, "doc_id", "text").count() == 0)
    val emptyNodes = Seq.empty[Long].toDF("node")
    val emptyPairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(graft.ops.Dedup.connectedComponents(emptyNodes, emptyPairs).count() == 0)
    // nodes without edges still label themselves
    val loneNodes = Seq(5L, 9L).toDF("node")
    val lone = graft.ops.Dedup.connectedComponents(loneNodes, emptyPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lone == Map(5L -> 5L, 9L -> 9L))
    val emptyIv = Seq.empty[(Long, Long, Long)].toDF("id", "s", "e")
    assert(graft.ops.Joins.intervalOverlapJoin(
      emptyIv, emptyIv.toDF("id2", "s2", "e2"),
      Seq.empty, "s", "e", "s2", "e2", 10L).count() == 0)
    val base = Seq((1L, "a")).toDF("k", "v")
    val got = graft.ops.Merge.upsert(base, base.limit(0), Seq("k")).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }

  test("boilerplate scrub removes over-threshold paragraphs everywhere") {
    val pdocs = Seq(
      (1L, "common header\n\nunique one"),
      (2L, "common header\n\nunique two"),
      (3L, "common header"), // nothing survives → doc disappears
      (4L, "all original here")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateScrub(pdocs, "doc_id", "text", maxDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // "common header" occurs in 3 docs ≥ 2 → scrubbed everywhere,
    // including its first occurrence (unlike paragraphDedup, which keeps
    // doc 1's copy); under-threshold paragraphs stay put.
    assert(got.toSeq == Seq(
      (1L, "unique one", 1L), (2L, "unique two", 1L),
      (4L, "all original here", 1L)))
  }

  test("substring spans merge overlapping flagged windows into maximal extents") {
    // Docs A and B share one 10-word run (unique tokens elsewhere), so the
    // flagged 8-word windows are exactly the 3 fully inside the run and
    // must merge into ONE [start, start+10) span per doc; doc C shares
    // nothing and must not appear.
    val run = (1 to 10).map(i => s"s$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    Seq(
      (1L, s"a1 a2 a3 a4 $run a5 a6 a7 a8 a9 a10"), // run at words 5..14
      (2L, s"b1 b2 $run b3 b4"),                    // run at words 3..12
      (3L, (1 to 20).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_dedup_substring_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 5L, 15L, 3L), (2L, 3L, 13L, 3L)),
      s"got ${got.toSeq}")
  }

  test("content-hash split co-assigns exact duplicates and covers all splits") {
    // The whole point of splitting on content hash rather than doc_id:
    // byte-identical docs can never straddle train/test. sf0.001's 50-doc
    // corpus carries no exact dups, so build one that does — 400 distinct
    // texts (enough for the 80/10/10 fractions to concentrate) plus a dup
    // of every 4th under a doc_id that a row-id split would scatter.
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    val base = (0 until 400).map(i => (i.toLong, s"doc $i body ${"w " * (i % 17)}"))
    val dups = (0 until 400 by 4).map(i => (1000L + i, base(i)._2))
    (base ++ dups).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val split = SparkEntry.queries("q_split_hash")(spark, dir)
    val withMd5 = split.join(
      graft.Tables.documents(spark, dir).select(col("doc_id"),
        md5(col("text").cast("binary")).as("m")), "doc_id")
    val perContent = withMd5.groupBy("m")
      .agg(countDistinct("split").as("k"), count(lit(1)).as("n"))
    assert(perContent.filter(col("k") > 1).count() == 0,
      "exact duplicates must land in one split")
    assert(perContent.filter(col("n") > 1).count() > 0,
      "corpus should contain exact dups for the property to bite")
    val frac = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = frac.values.sum.toDouble
    assert(frac.keySet == Set("train", "val", "test"))
    assert(frac("train") / total > 0.7 && frac("train") / total < 0.9,
      s"train fraction off: $frac")
  }

  test("url canonicalization strips fragment, utm query, host case, trailing slash") {
    val got = SparkEntry.queries("q_dedup_url")(spark, sf).collect()
    val urls = got.map(_.getAs[String]("canonical_url"))
    assert(urls.nonEmpty)
    assert(urls.forall(u => !u.contains("#")), "fragments must be stripped")
    assert(urls.forall(u => !u.contains("utm_")), "utm queries must be stripped")
    assert(urls.forall(u => !u.endsWith("/")), "trailing slashes must be stripped")
    assert(urls.forall(u => u.startsWith("https://example.com/")),
      "host must be lowercased")
    // real (non-utm) query strings survive canonicalization
    assert(urls.exists(_.contains("?id=")))
    // every raw URL is accounted for exactly once
    val nRaw = got.map(_.getAs[Long]("n_raw")).sum
    assert(nRaw == graft.Tables.orders(spark, sf).count())
  }

  test("pii scrub counts match the injection schedule exactly") {
    // n_* == 1 exactly when the builder injected that PII kind: pins both
    // that each pattern finds its target and that nothing in the base
    // text (or a neighboring replacement) accidentally matches.
    val got = SparkEntry.queries("q_scrub_pii")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_email") == (if (id % 3 == 0) 1L else 0L), s"email@$id")
      assert(r.getAs[Long]("n_ip") == (if (id % 4 == 0) 1L else 0L), s"ip@$id")
      assert(r.getAs[Long]("n_phone") == (if (id % 5 == 0) 1L else 0L), s"phone@$id")
    }
  }

  test("inverted index caps postings at 5 while df stays exact") {
    // The cap is the scale invariant: a stopword's postings list must not
    // grow with the corpus, but its df/total_tf must still count every doc.
    val got = SparkEntry.queries("q_index_postings")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val entries = r.getAs[String]("postings_csv").split(",")
      val df = r.getAs[Long]("df")
      assert(entries.length == math.min(df, 5L).toInt,
        s"term ${r.getAs[String]("term")}: ${entries.length} postings for df=$df")
      // entries are (tf DESC, doc_id ASC): monotone non-increasing tf
      val tfs = entries.map(_.split(":")(1).toInt)
      assert(tfs.sameElements(tfs.sortBy(-(_: Int))), s"postings not tf-sorted")
      assert(df <= r.getAs[Long]("total_tf"))
    }
    assert(got.exists(_.getAs[Long]("df") > 5),
      "corpus should contain terms with df above the cap for the property to bite")
  }

  test("bm25 ranks heavier query-term usage higher at equal length") {
    // Controlled corpus: the derived query is the top-3 words (a, b, c).
    // d1 and d2 have identical length; d1 carries 'a' twice vs d2's once,
    // so d1 must outrank d2. d3 shares no query term and must be absent.
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    Seq((1L, "a a b c f1"), (2L, "a b c f2 f3"), (3L, "q r s t u"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_text_bm25")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_match"), r.getAs[Double]("bm25"))).toMap
    assert(got.keySet == Set(1L, 2L), s"got $got")
    assert(got(1L)._1 == 3 && got(2L)._1 == 3)
    assert(got(1L)._2 > got(2L)._2,
      s"doc with tf=2 on a query term must outrank tf=1: $got")
  }

  test("pagerank concentrates mass on the high-degree side of the bipartite graph") {
    // Suppliers are ~20× rarer than parts in lineitem, so each supplier
    // node aggregates in-mass from many parts — its rank must sit well
    // above any part node's. Parity encodes the side (part=even, supp=odd).
    val got = SparkEntry.queries("q_graph_pagerank")(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank")))
    assert(got.nonEmpty)
    assert(got.forall(_._2 >= 150000L), "every node keeps the damping floor")
    val (supps, parts) = got.partition(_._1 % 2 == 1)
    val avgSupp = supps.map(_._2).sum / supps.size
    val avgPart = parts.map(_._2).sum / parts.size
    assert(avgSupp > 2 * avgPart,
      s"supplier avg $avgSupp should dominate part avg $avgPart")
  }

  test("gapfill LOCF matches an independent driver-side fill") {
    // Reference semantics recomputed naively over the collected sf0.001
    // events: per (user, hour) the last value by (ms-truncated ts,
    // event_id); hourly grid over the user's span; carry forward.
    val got = SparkEntry.queries("q_events_gapfill")(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value"),
        r.getAs[Long]("event_id")))
    val hourMs = 3600L * 1000
    def hourOf(ts: java.sql.Timestamp): Long = ts.getTime / hourMs
    val lastPerHour = ev.groupBy(e => (e._1, hourOf(e._2)))
      .map { case (k, es) =>
        k -> es.maxBy(e => (e._2.getTime, e._4))._3 }
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      val hours = es.map(e => hourOf(e._2))
      var carry = Double.NaN
      (hours.min to hours.max).map { h =>
        carry = lastPerHour.getOrElse((u, h), carry)
        (u, h) -> (carry, lastPerHour.contains((u, h)))
      }
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("h").getTime / hourMs)
      val (v, obs) = expected(k)
      assert(r.getAs[Double]("value_ff") == v && r.getAs[Boolean]("observed") == obs,
        s"mismatch at $k: got ${r.getAs[Double]("value_ff")}/${r.getAs[Boolean]("observed")} want $v/$obs")
    }
  }

  test("vocab growth counts first-seen bigrams across shard boundaries") {
    // doc 100 lands in prefix-sum shard 1 (doc_id div 64) — pins the
    // cross-shard offset join, not just the within-shard running sum.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    Seq((0L, "a b c"), (1L, "a b a b"), (2L, "x"), (3L, "c a"),
      (100L, "z z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_vocab_growth")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("new_grams"),
        r.getAs[Long]("vocab_size")))
    // doc 0: {a b, b c}; doc 1: {b a}; doc 2: none; doc 3: {c a}; 100: {z z}
    assert(got.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 3L), (3L, 1L, 4L),
      (100L, 1L, 5L)), s"got ${got.toSeq}")
  }

  test("triangle counts match brute force on a known graph") {
    // Orders build: a triangle {1,2,3}, a dangling edge {3,4}, a repeated
    // edge {1,2} (no new triangle — pairs are DISTINCT), and a K4
    // {5,6,7,8} (4 triangles, every node in 3). Also pins that the
    // degree-ordered orientation counts each triangle exactly once.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString
    Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 3L), (11L, 4L),
      (12L, 1L), (12L, 2L),
      (13L, 5L), (13L, 6L), (13L, 7L), (13L, 8L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_graph_triangles")(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles")).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 3L, 6L -> 3L, 7L -> 3L, 8L -> 3L)
    assert(got == want, s"got $got")
  }

  test("z-order layout bounds both key spans per file") {
    // The pruning claim: a typical file's min/max range is narrow in BOTH
    // keys (a one-key sort leaves the other key's span at full width).
    // With 4-bit buckets and 64 files, an aligned file covers a 2×2 cell
    // block — span ≈ range/8 per dim; assert the median stays under
    // range/3, leaving room for boundary files that straddle z-cells.
    val got = SparkEntry.queries("q_layout_zorder")(spark, sf).collect()
    val li = graft.Tables.lineitem(spark, sf)
    assert(got.map(_.getAs[Long]("n_rows")).sum == li.count())
    val Array(pLo, pHi, sLo, sHi) = li
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .collect()(0).toSeq.map(_.toString.toLong).toArray
    def median(xs: Seq[Long]) = xs.sorted.apply(xs.size / 2)
    val partMed = median(got.map(r => r.getAs[Long]("part_max") - r.getAs[Long]("part_min")).toSeq)
    val suppMed = median(got.map(r => r.getAs[Long]("supp_max") - r.getAs[Long]("supp_min")).toSeq)
    assert(partMed <= (pHi - pLo) / 3, s"part span median $partMed vs range ${pHi - pLo}")
    assert(suppMed <= (sHi - sLo) / 3, s"supp span median $suppMed vs range ${sHi - sLo}")
  }

  test("epoch shuffle: full permutation per epoch, contiguous shard ranks, epochs differ") {
    val got = SparkEntry.queries("q_shuffle_epoch")(spark, sf).cache()
    val n = graft.Tables.documents(spark, sf).count()
    val perEpoch = got.groupBy("epoch")
      .agg(countDistinct("doc_id").as("nd"), count(lit(1)).as("cnt")).collect()
    assert(perEpoch.length == 2)
    perEpoch.foreach(r =>
      assert(r.getAs[Long]("nd") == n && r.getAs[Long]("cnt") == n))
    // within every (epoch, shard) the ranks are exactly 1..k
    val badRanks = got.groupBy("epoch", "shard")
      .agg(min("rank").as("mn"), max("rank").as("mx"), count(lit(1)).as("cnt"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("cnt")).count()
    assert(badRanks == 0)
    // the reshuffle reshuffles: epoch 0 and epoch 1 visit docs in
    // different orders
    def order(e: Int) = got.filter(col("epoch") === e)
      .orderBy("shard", "rank").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(order(0) != order(1))
    got.unpersist()
  }

  test("collocation PMI equals the ln-sum recomputed from raw counts") {
    val got = SparkEntry.queries("q_text_collocations")(spark, sf).collect()
    assert(got.nonEmpty)
    val d = graft.Tables.documents(spark, sf)
    val words = d.select(explode(split(col("text"), " ")).as("w")).cache()
    val nt = words.count()
    val uni = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bgs = d.select(explode(
      TextAnalysis.bigrams(split(col("text"), " "), " ")).as("b")).cache()
    val nb = bgs.count()
    val bgc = bgs.groupBy("b").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val np = r.getAs[Long]("n_pair")
      assert(np >= 25 && bgc(s"$w1 $w2") == np)
      val want = math.log(np.toDouble) + 2.0 * math.log(nt.toDouble) -
        math.log(nb.toDouble) - math.log(uni(w1).toDouble) -
        math.log(uni(w2).toDouble)
      assert(math.abs(r.getAs[Double]("pmi") - want) < 1e-9)
    }
    words.unpersist(); bgs.unpersist()
  }

  test("edit-distance dedup honors its one-clean-end contract and the 20% bound") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("editdist").toString
    val mid = (1 to 40).map(i => s"w$i").mkString(" ")
    val a = s"alpha beta gamma delta eps zeta eta theta $mid omega psi chi phi ups tau sig rho"
    // b: one mid-doc substitution — both ends clean, tiny edit → reported
    val b = a.replace("w20", "xx20")
    // c: substitutions inside BOTH 8-token ends — out of contract → not reported
    val c = a.replace("beta", "beee").replace("sig", "sgg")
    // d: word-scramble of a (same word set, huge edit) — not reported
    val dScr = a.split(" ").reverse.mkString(" ")
    // e: unrelated
    val e = (1 to 60).map(i => s"v$i").mkString(" ")
    Seq((1L, a), (2L, b), (3L, c), (4L, dScr), (5L, e))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_dedup_editdist")(spark, dir).collect()
    val pairs = got.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup missed: $pairs")
    assert(!pairs.exists { case (x, y) => x == 3L || y == 3L },
      "both-ends-edited pair is outside the declared contract")
    assert(!pairs.exists { case (x, y) => x == 4L || y == 4L },
      "a word scramble is set-similar but not edit-similar")
    // reported edits satisfy the bound and match a reference DP
    def lev(s: String, t: String): Int = {
      val dp = Array.tabulate(t.length + 1)(identity)
      for (i <- 1 to s.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to t.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (s(i - 1) == t(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(t.length)
    }
    val texts = Map(1L -> a, 2L -> b, 3L -> c, 4L -> dScr, 5L -> e)
    got.foreach { r =>
      val (d1, d2) = (r.getAs[Long]("d1"), r.getAs[Long]("d2"))
      val edit = r.getAs[Long]("edit")
      assert(edit == lev(texts(d1), texts(d2)))
      assert(edit * 5 <= r.getAs[Long]("max_chars"))
    }
    // the production corpus yields pairs too (the injected near-dups)
    assert(SparkEntry.queries("q_dedup_editdist")(spark, sf).count() > 0)
  }

  test("bigram NLL exercises all three Stupid-Backoff tiers on a planted corpus") {
    import java.nio.file.Files
    // replicate the query's content-hash split so the plant is deterministic
    def bucket(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
    }
    // train pool: "alpha beta" chains with a gamma/delta tail — the model
    // sees bigrams (alpha,beta),(beta,alpha),(beta,gamma),(beta,delta)
    // and all four words
    val pool = (0 until 30).map { i =>
      val tail = if (i % 2 == 0) "gamma" else "delta"
      (100L + i, ("alpha beta " * (3 + i % 5)).trim + " " + tail)
    }
    assert(pool.count(p => bucket(p._2) < 80) >= 2, "need train docs")
    // tier-3 plant: every word OOV, doc held out
    val oov = (0 until 100).map(k => s"zoov1 zoov2 zoov3 zk$k")
      .find(t => bucket(t) >= 80).get
    // tier-2 plant: seen words, unseen bigrams, held out
    val t2 = (1 to 40).map(n => ("gamma delta " * n).trim)
      .find(t => bucket(t) >= 80).get
    val dir = Files.createTempDirectory("bigramnll").toString
    (pool :+ (1L, oov) :+ (2L, t2)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_text_bigram_nll")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // reference counts over the replicated train split
    val train = pool.filter(p => bucket(p._2) < 80).map(_._2)
    val toks = train.flatMap(_.split(" "))
    val nt = toks.length.toDouble
    val cnt = toks.groupBy(identity).view.mapValues(_.length).toMap
    // tier 3: all positions hit the OOV floor
    val p3 = got(1L)
    assert(p3.getAs[Long]("n_backoff") == p3.getAs[Long]("n_bg"))
    assert(math.abs(p3.getAs[Double]("nll") - math.log(25.0 * nt / 4.0)) < 1e-9)
    // tier 2: every bigram backs off to seen-unigram scores
    val p2 = got(2L)
    assert(p2.getAs[Long]("n_backoff") == p2.getAs[Long]("n_bg"))
    val t2toks = t2.split(" ")
    val expect2 = -t2toks.drop(1)
      .map(w => math.log(2.0 * cnt(w) / (5.0 * nt))).sum / (t2toks.length - 1)
    assert(math.abs(p2.getAs[Double]("nll") - expect2) < 1e-9)
    // tier 1: a train-split doc scores fully in-model
    val trainId = pool.find(p => bucket(p._2) < 80).get._1
    assert(got(trainId).getAs[Long]("n_backoff") == 0L)
  }

  test("outlier filter flags exactly the farthest decile per cluster") {
    val got = SparkEntry.queries("q_filter_outliers")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("cid")).distinct.length > 1)
    got.groupBy(_.getAs[Long]("cid")).foreach { case (_, rows) =>
      val flagged = rows.filter(_.getAs[Boolean]("is_outlier"))
      assert(flagged.length == rows.length / 10)
      // every flagged vector sorts strictly before every kept one under
      // the (cosine, vec_id) order — the cut is a clean rank prefix
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Double]("cos_center"), r.getAs[Long]("vec_id"))
      val kept = rows.filterNot(_.getAs[Boolean]("is_outlier"))
      if (flagged.nonEmpty && kept.nonEmpty)
        assert(Ordering[(Double, Long)].lt(flagged.map(key).max, kept.map(key).min))
    }
  }

  test("multimodal decode plumbing produces typed metadata per row") {
    val got = Multimodal.decode(Multimodal.pngPayload(docs, "doc_id"), "doc_id")
      .select("doc_id", "meta.width", "meta.height", "meta.channels", "meta.pixel_sum")
      .orderBy("doc_id").collect()
    assert(got.length == 5)
    got.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.fixtureDims(id)
      val want = (for { x <- 0 until w; y <- 0 until h; c <- 0 until 3 }
        yield (x * 31L + y * 7L + c * 13L + id) % 256).sum
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == 3 && r.getAs[Long]("pixel_sum") == want)
    }
  }

  test("q_text_compression: repetitive text compresses far below varied text") {
    val varied = (0 until 600).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    val docs = Seq((1L, "spam ham " * 300), (2L, varied)).toDF("doc_id", "text")
    def run() = graft.queries.LlmOps9.deflateStats(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_deflate"), r.getAs[Double]("ratio"))).toSeq
    val out = run()
    val rep = out(0)._4; val nat = out(1)._4
    assert(rep < 0.1, s"repetitive text should deflate hard, ratio=$rep")
    assert(nat > rep * 3, s"varied text must compress worse: $nat vs $rep")
    assert(out.forall(r => r._4 > 0 && r._4 < 1.3), s"ratios out of range: $out")
    assert(run() == out, "deflate output must be run-to-run deterministic")
    // the registered banded calibration over the real corpus: every
    // band reports its booleans TRUE (the oracle pins the same)
    val bands = SparkEntry.queries("q_text_compression")(spark, sf).collect()
    assert(bands.nonEmpty)
    bands.foreach { b =>
      assert(b.getAs[Boolean]("ratio_in_range") &&
        b.getAs[Boolean]("deflate_bounded"), s"band failed calibration: $b")
    }
  }

  test("dHash: deterministic, discriminative, and stable under a 1-LSB pixel nudge") {
    // robustness on images large enough that each 9x8 grid cell samples
    // a distinct pixel (tiny fixtures alias one pixel into several grid
    // cells, which legitimately amplifies a perturbation)
    val (w, h) = (64, 48)
    var distinct = Set.empty[Long]
    (0 until 100).foreach { id =>
      val h0 = Multimodal.dHash(Multimodal.makeImage(id, w, h))
      assert(h0 == Multimodal.dHash(Multimodal.makeImage(id, w, h)),
        s"dHash must be deterministic (id=$id)")
      distinct += h0
      // +1 on one sampled pixel's blue channel: affects at most the two
      // gradient comparisons that pixel participates in
      val img2 = Multimodal.makeImage(id, w, h)
      val sx = 4 * w / 9; val sy = 4 * h / 8
      val rgb = img2.getRGB(sx, sy)
      val b = math.min(255, (rgb & 0xff) + 1)
      img2.setRGB(sx, sy, (rgb & 0xffff00) | b)
      val h1 = Multimodal.dHash(img2)
      assert(java.lang.Long.bitCount(h0 ^ h1) <= 2,
        s"1-LSB nudge moved ${java.lang.Long.bitCount(h0 ^ h1)} bits (id=$id)")
    }
    // the fixed-size linear fixture repeats gradient patterns across
    // seeds; discrimination is asserted on the corpus-like variable-dim
    // family below (the registered query measured 431 distinct of 500)
    assert(distinct.size >= 30,
      s"expected some spread at fixed dims, got ${distinct.size} of 100")
    val corpusLike = (0 until 200).map { id =>
      val (fw, fh) = Multimodal.fixtureDims(id)
      Multimodal.dHash(Multimodal.makeImage(id, fw, fh))
    }.toSet
    assert(corpusLike.size >= 120,
      s"variable-dim family must discriminate, got ${corpusLike.size} of 200")
  }
}
