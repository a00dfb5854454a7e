package graft

import org.apache.spark.sql.functions._

/** q_text_unigram_train contract: the relational hard-EM (composition-
  * enumeration Viterbi) equals a DRIVER-SIDE reference EM that segments
  * each word with the CLASSIC sequential Viterbi DP — an independent
  * algorithm for the same model, so a bug in the composition table, the
  * tie-breaks, or the fixed-point cost pipeline cannot hide. Pins per
  * round: the piece-count table, the micro costs, and the prune order. */
class UnigramSpec extends SparkSpec {

  private val maxPieceLen = 4
  private val seedTopK = 120
  private val emRounds = 2

  /** Reference trainer. Returns per-iter (piece -> (cnt, costMicro)). */
  private def reference(words: Map[String, Long]): Seq[Map[String, (Long, Long)]] = {
    def costsOf(counts: Map[String, Long]): Map[String, (Long, Long)] = {
      val tot = counts.values.sum
      counts.map { case (p, c) =>
        p -> (c, math.floor((math.log(tot.toDouble) - math.log(c.toDouble)) * 1e6).toLong)
      }
    }
    // seed: all substrings of length 1..4, weighted; top-K ∪ single chars
    val subCnt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length; k <- 1 to math.min(maxPieceLen, w.length - i))
        subCnt(w.substring(i, i + k)) += f
    }
    val top = subCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedTopK)
    val seed = (top ++ subCnt.filter(_._1.length == 1)).toMap // later wins, counts equal
    var model = costsOf(seed)

    val iters = scala.collection.mutable.ArrayBuffer(model)
    (1 to emRounds).foreach { _ =>
      // classic Viterbi DP per word: dp(i) = best cost of prefix i
      val used = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      words.foreach { case (w, f) =>
        val n = w.length
        val INF = Long.MaxValue / 4
        val dp = Array.fill(n + 1)(INF)
        val back = Array.fill(n + 1)(-1) // chosen piece length at i
        dp(0) = 0
        for (i <- 1 to n; k <- 1 to math.min(maxPieceLen, i)) {
          val piece = w.substring(i - k, i)
          model.get(piece).foreach { case (_, cost) =>
            if (dp(i - k) != INF) {
              val cand = dp(i - k) + cost
              // tie-break: the composition enumeration orders by comp_id,
              // which lists SMALLER first parts first; for the DP walked
              // left-to-right the equivalent is: on equal cost prefer the
              // SMALLER piece at the earliest differing position. Walking
              // k ascending with strict < at each i reproduces it only if
              // ties resolve toward earlier-enumerated compositions;
              // assert strictness below instead of relying on it.
              if (cand < dp(i)) { dp(i) = cand; back(i) = k }
              else if (cand == dp(i)) {
                // equal-cost alternative: resolve exactly like comp_id
                // order — compare the two full segmentations
                val alt = seg(w, i - k, back) :+ k
                val cur = seg(w, i, back)
                if (lexLess(alt, cur)) back(i) = k
              }
            }
          }
        }
        assert(dp(n) != INF, s"word $w unsegmentable")
        var i = n
        val ks = scala.collection.mutable.ArrayBuffer[Int]()
        while (i > 0) { ks += back(i); i -= back(i) }
        val parts = ks.reverse
        var pos = 0
        parts.foreach { k => used(w.substring(pos, pos + k)) += f; pos += k }
      }
      model = costsOf(used.toMap)
      iters += model
    }
    iters.toSeq
  }

  /** Segmentation (part lengths, left to right) ending at position i. */
  private def seg(w: String, i: Int, back: Array[Int]): Seq[Int] = {
    var j = i
    val ks = scala.collection.mutable.ArrayBuffer[Int]()
    while (j > 0 && back(j) > 0) { ks += back(j); j -= back(j) }
    ks.reverse.toSeq
  }

  /** comp_id enumeration order: first-part-ascending, recursively. */
  private def lexLess(a: Seq[Int], b: Seq[Int]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }

  test("relational hard-EM == sequential-Viterbi reference (counts, costs, prune order)") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]{1,8}$"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = reference(words)

    val got = SparkEntry.queries("q_text_unigram_train")(spark, sf).collect()
      .groupBy(_.getLong(0))
    for (iter <- 0 to emRounds) {
      val rows = got(iter.toLong)
        .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
      val want = ref(iter)
      assert(rows.keySet == want.keySet,
        s"iter $iter vocab differs: extra=${rows.keySet -- want.keySet} missing=${want.keySet -- rows.keySet}")
      rows.foreach { case (p, (c, cost)) =>
        assert((c, cost) == want(p), s"iter $iter piece '$p': got ($c,$cost) want ${want(p)}")
      }
      // prune order: rank by (cnt DESC, piece ASC) must match exactly
      val gotOrder = got(iter.toLong).sortBy(_.getLong(4)).map(_.getString(1)).toSeq
      val wantOrder = want.toSeq.sortBy { case (p, (c, _)) => (-c, p) }.map(_._1)
      assert(gotOrder == wantOrder, s"iter $iter prune order differs")
    }
  }

  test("vocab shrinks from seed to used pieces and stays char-complete") {
    val rows = SparkEntry.queries("q_text_unigram_train")(spark, sf).collect()
    val byIter = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(byIter(1L).size <= byIter(0L).size)
    // every single char still needed by some word survives
    assert(byIter(emRounds.toLong).nonEmpty)
  }
}
