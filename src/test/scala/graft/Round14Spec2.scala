package graft

import org.apache.spark.sql.functions._

/** Round-14 batch 2 contracts, each against an independent Scala
  * reference computed from the raw sf0.001 parquet (the DuckDB oracle
  * cross-checks the SQL twin; these pins check the MATH):
  * q_stats_gini vs an exact BigInt Lorenz sum, q_stats_jackknife vs a
  * directly-computed leave-one-out variance (same 1e-4 quantization),
  * q_similarity_hybrid vs a full brute-force re-derivation of both
  * channels + min-max fusion, and q_sql_groupbyall vs its DataFrame
  * groupBy twin.
  */
class Round14Spec2 extends SparkSpec {

  private def centsOf(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  test("q_stats_gini matches an exact BigInt Lorenz-sum reference") {
    val got = SparkEntry.queries("q_stats_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_suppkey", "l_extendedprice").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(r => centsOf(r.getDouble(1))).sum }
    val supNation = {
      val nat = spark.read.parquet(s"$sf/nation.parquet").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      spark.read.parquet(s"$sf/supplier.parquet").collect()
        .map(r => r.getLong(0) -> nat(r.getInt(2))).toMap
    }
    val byNation = li.toSeq.flatMap { case (sk, rev) =>
      supNation.get(sk).map(n => (n, sk, rev))
    }.groupBy(_._1)

    assert(got.keySet == byNation.keySet)
    for ((nation, rows) <- byNation) {
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.size
      val srev = sorted.map(BigInt(_)).sum
      val sirev = sorted.zipWithIndex
        .map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = (BigDecimal(2 * sirev - BigInt(n + 1) * srev) /
        BigDecimal(BigInt(n) * srev)).toDouble
      val (gn, grev, ggini) = got(nation)
      assert(gn == n, s"$nation supplier count")
      assert(math.abs(grev - srev.toDouble / 100.0) < 1e-6, s"$nation rev")
      assert(math.abs(ggini - gini) < 1e-12, s"$nation gini: $ggini vs $gini")
      assert(ggini >= 0.0 && ggini < 1.0, s"$nation gini in [0,1)")
    }
  }

  test("q_stats_jackknife matches a directly-computed leave-one-out variance") {
    val got = SparkEntry.queries("q_stats_jackknife")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), centsOf(r.getDouble(1)), r.getDouble(2).toLong))
    for ((flag, fr) <- rows.groupBy(_._1)) {
      val n = fr.length
      val sp = fr.map(_._2).sum
      val sq = fr.map(_._3).sum
      val ri = fr.map { case (_, p, q) =>
        math.floor((sp - p).toDouble / (sq - q).toDouble * 1e4).toLong
      }
      val s1 = ri.map(BigInt(_)).sum
      val s2 = ri.map(r => BigInt(r) * BigInt(r)).sum
      val vr = BigDecimal(BigInt(n) * s2 - s1 * s1).toDouble /
        n.toDouble / n.toDouble * (n.toDouble - 1.0) / n.toDouble / 1e8
      val (gn, gratio, gvar, gse) = got(flag)
      assert(gn == n)
      assert(math.abs(gratio - sp.toDouble / sq.toDouble) < 1e-9)
      assert(math.abs(gvar - vr) / vr < 1e-12, s"$flag var: $gvar vs $vr")
      assert(math.abs(gse - math.sqrt(vr)) < 1e-12)
    }
  }

  test("q_similarity_hybrid matches a brute-force two-channel fusion reference") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def bucket(a: Array[Float]): Long =
      (0 until 16).map(i => if (a(i) > 0f) 1L << i else 0L).sum

    val expected = (0L until 4L).flatMap { qid =>
      val qv = vecs.find(_._1 == qid).get._2
      val qb = bucket(qv)
      val cand = vecs.filter(_._1 != qid).map { case (id, v) =>
        (id, cos(v, qv), 16L - java.lang.Long.bitCount(bucket(v) ^ qb))
      }
      val rCos = cand.sortBy(c => (-c._2, c._1)).take(20).map(_._1).toSet
      val rHam = cand.sortBy(c => (-c._3, c._1)).take(20).map(_._1).toSet
      val kept = cand.filter(c => rCos(c._1) || rHam(c._1))
      val (cmin, cmax) = {
        val cs = kept.filter(c => rCos(c._1)).map(_._2); (cs.min, cs.max)
      }
      val (hmin, hmax) = {
        val hs = kept.filter(c => rHam(c._1)).map(_._3); (hs.min, hs.max)
      }
      kept.map { case (id, c, h) =>
        val dn = if (!rCos(id)) 0.0
          else if (cmax == cmin) 1.0 else (c - cmin) / (cmax - cmin)
        val sn = if (!rHam(id)) 0.0
          else if (hmax == hmin) 1.0
          else (h - hmin).toDouble / (hmax - hmin).toDouble
        val fq = 7L * math.floor(dn * 1e9).toLong +
          3L * math.floor(sn * 1e9).toLong
        (qid, id, h, c, fq)
      }.sortBy(r => (-r._5, r._2)).take(10).zipWithIndex.map {
        case ((q, id, h, c, fq), i) => (q, (i + 1).toLong, id, h, c, fq / 1e10)
      }
    }

    val got = SparkEntry.queries("q_similarity_hybrid")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4,
        s"row identity: $g vs $e")
      assert(math.abs(g._5 - e._5) < 1e-12, s"cosine: $g vs $e")
      assert(math.abs(g._6 - e._6) < 1e-12, s"fused: $g vs $e")
      assert(g._6 >= 0.0 && g._6 <= 1.0)
    }
  }

  test("q_sql_groupbyall equals its DataFrame groupBy twin") {
    val got = SparkEntry.queries("q_sql_groupbyall")(spark, sf).collect().toSeq
    val twin = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .cast("double") / 100.0).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    assert(got == twin)
  }
}
