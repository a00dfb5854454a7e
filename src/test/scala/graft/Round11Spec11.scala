package graft

import org.apache.spark.sql.functions._

/** Contracts for round-11 batch 10 (Gopher rule battery, burst
  * detection with hysteresis). */
class Round11Spec11 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_quality_gopher: per-rule fail counts match driver brute force") {
    val rows = run("q_quality_gopher").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val stop = graft.ops.TextAnalysis.enStopwords.toSet
    val expected = docs.groupBy(_._1).view.mapValues { ds =>
      val flags = ds.map { case (_, t) =>
        val toks = t.split(" ", -1)
        val nw = toks.count(_.nonEmpty).toLong
        val wchars = t.replace(" ", "").length.toLong
        val nHash = (t.length - t.replace("#", "").length).toLong
        val nEll = ((t.length - t.replace("...", "").length) / 3).toLong
        val nAlpha = toks.count(w => w.exists(c => c.isLetter &&
          ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))).toLong
        val nStop = toks.count(stop.contains).toLong
        (!(nw >= 20 && nw <= 1000),
          !(3 * nw <= wchars && wchars <= 10 * nw),
          !(10 * (nHash + nEll) <= nw),
          !(5 * nAlpha >= 4 * nw),
          !(nStop >= 2))
      }
      (flags.length.toLong, flags.count(_._1).toLong, flags.count(_._2).toLong,
        flags.count(_._3).toLong, flags.count(_._4).toLong,
        flags.count(_._5).toLong,
        flags.count(f => !f._1 && !f._2 && !f._3 && !f._4 && !f._5).toLong)
    }.toMap
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (src, (n, f1, f2, f3, f4, f5, pass)) =>
      val r = rows(src)
      assert(r.getAs[Long]("n_docs") == n, s"$src n_docs")
      assert(r.getAs[Long]("fail_wordcount") == f1, s"$src wordcount")
      assert(r.getAs[Long]("fail_wordlen") == f2, s"$src wordlen")
      assert(r.getAs[Long]("fail_symbol") == f3, s"$src symbol")
      assert(r.getAs[Long]("fail_alpha") == f4, s"$src alpha")
      assert(r.getAs[Long]("fail_stopword") == f5, s"$src stopword")
      assert(r.getAs[Long]("n_pass") == pass, s"$src pass")
    }
  }

  test("q_events_bursts: automaton re-derivable; hysteresis holds") {
    val rows = run("q_events_bursts").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("cnt"),
        r.getAs[Boolean]("high"), r.getAs[Boolean]("in_burst")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // contiguous day coverage
    assert(rows.map(_._1).toSeq == (rows.head._1 to rows.last._1))
    // high flag re-derivable: 2*cnt > 3*base with base = total div n
    val base = rows.map(_._2).sum / rows.length
    rows.foreach { case (_, cnt, high, _) =>
      assert(high == (2 * cnt > 3 * base))
    }
    // automaton brute force: enter after 2 consecutive highs, exit
    // after 2 consecutive lows (packed state s = 2*in_burst + run)
    var s = 0L
    rows.foreach { case (day, _, high, inBurst) =>
      val h = if (high) 1L else 0L
      s = if (s < 2) { if (h == 1) { if (s == 1) 2L else 1L } else 0L }
          else { if (h == 1) 2L else { if (s == 3) 0L else 3L } }
      assert(inBurst == (s >= 2), s"day $day")
    }
    // hysteresis: in_burst never true unless the 2 PRECEDING days
    // (inclusive) were high at entry
    rows.sliding(2).foreach {
      case Array((_, _, _, b0), (_, _, h1, b1)) =>
        if (!b0 && b1) assert(h1) // entering requires a high day
      case _ =>
    }
  }
}
