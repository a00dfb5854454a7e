package graft

import org.apache.spark.sql.functions._

/** q_quality_lr contracts:
  *   1. the distributed fixed-point trainer is BIT-EXACT against a
  *      driver-side reference implementation of the same update
  *      (collected features, Scala loops, Long arithmetic);
  *   2. the learned score's ROC-AUC against the labels beats the best
  *      single heuristic gate used as a score (the q_stats_auc midrank
  *      identity, computed on collected data);
  *   3. the documented magnitude bound holds (|z| far below the
  *      overflow line).
  */
class QualityLrSpec extends SparkSpec {

  private def featRows: Array[(Long, Long, Long)] = {
    val bucket = (conv(substring(md5(col("word").cast("binary")), 1, 15),
      16, 10).cast("long") % 64).as("bucket")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), bucket)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).cast("long").as("x"))
      .unionAll(docs.select(col("doc_id"), lit(64L).as("bucket"), lit(1L).as("x")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private def labels: Map[Long, Long] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (col("n_chars") >= 300).cast("long").as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The reference trainer: same micro fixed-point update, plain loops. */
  private def referenceWeights(rounds: Int): Seq[Map[Long, Long]] = {
    val feats = featRows
    val lab = labels
    val n = lab.size.toLong
    var w = (0L to 64L).map(_ -> 0L).toMap
    (1 to rounds).map { _ =>
      val z = feats.groupBy(_._1).map { case (doc, fs) =>
        doc -> fs.map { case (_, b, x) => x * w(b) }.sum
      }
      val r = z.map { case (doc, zi) =>
        val p = (500000L * (1000000L + math.abs(zi) + zi)) / (1000000L + math.abs(zi))
        doc -> (p - 1000000L * lab(doc))
      }
      val g = feats.groupBy(_._2).map { case (b, fs) =>
        b -> fs.map { case (doc, _, x) => x * r(doc) }.sum
      }
      w = w.map { case (b, wb) => b -> (wb - g.getOrElse(b, 0L) / (4L * n)) }
      w
    }
  }

  /** Midrank ROC-AUC of `score` against binary `y` (exact, driver-side). */
  private def auc(scored: Seq[(Double, Long)]): Double = {
    val byScore = scored.groupBy(_._1).toSeq.sortBy(_._1)
    var before = 0L
    var sumRank2Pos = 0.0 // doubled midranks of positives
    var nPos = 0L
    byScore.foreach { case (_, rows) =>
      val t = rows.size.toLong
      val pos = rows.count(_._2 == 1L).toLong
      sumRank2Pos += pos.toDouble * (2 * before + t + 1)
      nPos += pos
      before += t
    }
    val nNeg = scored.size - nPos
    (sumRank2Pos - nPos.toDouble * (nPos + 1.0)) / (2.0 * nPos * nNeg)
  }

  test("distributed trainer is bit-exact vs the driver-side reference") {
    val got = SparkEntry.queries("q_quality_lr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ref = referenceWeights(3)
    for (i <- 1 to 3; b <- 0L to 64L)
      assert(got((i.toLong, b)) == ref(i - 1)(b),
        s"iter $i bucket $b: got ${got((i.toLong, b))} ref ${ref(i - 1)(b)}")
  }

  test("learned score AUC beats the best single heuristic gate") {
    val wFinal = referenceWeights(3).last
    val lab = labels
    val z = featRows.groupBy(_._1).map { case (doc, fs) =>
      doc -> fs.map { case (_, b, x) => x * wFinal(b) }.sum
    }
    val aucLr = auc(z.toSeq.map { case (doc, zi) => (zi.toDouble, lab(doc)) })
    // heuristic baselines as scores: each binary gate, plus raw length
    val gates = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        (expr("regexp_count(text, '[.!?]')") * 20 >=
          size(filter(split(col("text"), " "), x => x =!= ""))).cast("long").as("b"),
        (size(filter(split(col("text"), " "), x => x =!= "")) >= 60).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val aucB = auc(gates.map(g => (g._2.toDouble, lab(g._1))).toSeq)
    val aucC = auc(gates.map(g => (g._3.toDouble, lab(g._1))).toSeq)
    val best = math.max(aucB, aucC)
    assert(aucLr >= best,
      f"LR auc $aucLr%.4f below best heuristic gate $best%.4f")
    assert(aucLr >= 0.9, f"LR auc $aucLr%.4f below the 0.9 floor")
  }

  test("z magnitudes stay far below the fixed-point overflow line") {
    val wFinal = referenceWeights(3).last
    val maxZ = featRows.groupBy(_._1).map { case (_, fs) =>
      math.abs(fs.map { case (_, b, x) => x * wFinal(b) }.sum)
    }.max
    assert(maxZ < 1e12, s"max |z| $maxZ approaches the 1.8e13 overflow bound")
  }
}
