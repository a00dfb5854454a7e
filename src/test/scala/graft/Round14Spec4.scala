package graft

import org.apache.spark.sql.functions._

/** Round-14 batch 4 contracts vs independent Scala references from the
  * raw sf0.001 parquet: q_text_oov vs a direct Set-based vocabulary
  * check (proving the head/tail skew split is output-neutral),
  * q_stats_mannkendall vs the literal O(n²) pairwise S computation,
  * and q_stats_power vs directly-computed design arithmetic.
  */
class Round14Spec4 extends SparkSpec {

  test("q_text_oov matches a direct Set-based vocabulary reference") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val vocab = rows.filter(_._1 % 5 != 0)
      .flatMap(_._3.split(" ", -1)).toSet
    val evalRows = rows.filter(_._1 % 5 == 0)
    val expected = evalRows.groupBy(_._2).map { case (src, docs) =>
      val toks = docs.flatMap(d => d._3.split(" ", -1).map(w => (d._1, w)))
      val nOov = toks.count(t => !vocab(t._2))
      val types = toks.map(_._2).distinct
      val oovTypes = types.count(w => !vocab(w))
      src -> (docs.map(_._1).distinct.length.toLong, toks.length.toLong,
        nOov.toLong, types.length.toLong, oovTypes.toLong)
    }
    val got = SparkEntry.queries("q_text_oov")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (nd, nt, no, ty, oty) = expected(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == nt && r.getLong(3) == no,
        s"${r.getString(0)} token counts")
      assert(r.getLong(5) == ty && r.getLong(6) == oty,
        s"${r.getString(0)} type counts")
      assert(r.getDouble(4) == no.toDouble / nt.toDouble)
      assert(r.getDouble(7) == oty.toDouble / ty.toDouble)
    }
  }

  test("q_stats_mannkendall matches the literal pairwise S computation") {
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .select(floor(unix_millis(col("ts").cast("timestamp")) / lit(86400000L))
        .cast("long").as("day"))
      .groupBy("day").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length
    var sStat = 0L
    for (i <- 0 until n; j <- i + 1 until n)
      sStat += java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong
    val tieTerm = daily.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - tieTerm).toDouble / 18.0
    val z = if (sStat > 0) (sStat - 1).toDouble / math.sqrt(varS)
      else if (sStat < 0) (sStat + 1).toDouble / math.sqrt(varS) else 0.0

    val got = SparkEntry.queries("q_stats_mannkendall")(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n && r.getLong(1) == sStat)
    assert(r.getDouble(2) == varS)
    assert(math.abs(r.getDouble(3) - z) < 1e-12)
    val trend = if (z > 1.959963984540054) "increasing"
      else if (z < -1.959963984540054) "decreasing" else "none"
    assert(r.getString(4) == trend)
  }

  test("q_stats_power matches directly-computed design arithmetic") {
    val conv = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (u, es) =>
        (u % 2, if (es.count(_._2 == "purchase") >= 13) 1L else 0L)
      }
    val (n0, c0) = (conv.count(_._1 == 0).toLong,
      conv.filter(_._1 == 0).map(_._2).sum)
    val (n1, c1) = (conv.count(_._1 == 1).toLong,
      conv.filter(_._1 == 1).map(_._2).sum)
    val p0 = c0.toDouble / n0.toDouble
    val p1 = c1.toDouble / n1.toDouble
    val phat = (c0 + c1).toDouble / (n0 + n1).toDouble
    val se = math.sqrt(phat * (1.0 - phat) * (1.0 / n0 + 1.0 / n1))
    val r = SparkEntry.queries("q_stats_power")(spark, sf).collect().head
    assert(r.getLong(0) == n0 && r.getLong(1) == c0 &&
      r.getLong(2) == n1 && r.getLong(3) == c1)
    assert(r.getDouble(4) == p0 && r.getDouble(5) == p1)
    assert(math.abs(r.getDouble(6) - (p1 - p0) / se) < 1e-12)
    assert(math.abs(r.getDouble(7) - 2.8015852181129683 * se) < 1e-12)
    assert(r.getBoolean(8) == (math.abs(p1 - p0) >= r.getDouble(7)))
  }
}
