package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Round-14 batch 5 contracts vs independent Scala references:
  * q_stats_permtest vs a direct MessageDigest-based replay of the
  * hash-seeded relabelings (every stat_b, not just the p-value), and
  * q_curation_submodular vs a literal Set-based greedy loop (plus the
  * diminishing-returns invariant greedy guarantees).
  */
class Round14Spec5 extends SparkSpec {

  /** The query's digest: first 8 hex chars of md5(key) as a long; label
    * for permutation b is bit b. */
  private def md5h32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q_stats_permtest matches a direct MessageDigest relabeling replay") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")).as("key"),
        col("l_quantity").cast("long").as("v"),
        (col("l_linestatus") === lit("O")).cast("long").as("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = rows.length.toLong
    def stat(lbl: ((String, Long, Long)) => Long): Double = {
      val s1 = rows.map(r => r._2 * lbl(r)).sum.toDouble
      val n1 = rows.map(lbl).sum.toDouble
      val s0 = rows.map(r => r._2 * (1 - lbl(r))).sum.toDouble
      math.abs(s1 / n1 - s0 / (n - n1))
    }
    val obs = stat(_._3)
    val stats = (0 until 32).map(b => stat(r => (md5h32(r._1) >> b) & 1L))
    val nGe = stats.count(_ >= obs).toLong

    val r = SparkEntry.queries("q_stats_permtest")(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) - obs) < 1e-12, s"obs ${r.getDouble(1)} vs $obs")
    assert(r.getLong(2) == nGe, s"n_ge ${r.getLong(2)} vs $nGe")
    assert(r.getDouble(3) == (nGe + 1).toDouble / 33.0)
    // a null-hypothesis relabeling should rarely beat the real split,
    // but the pin above is exact either way
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q_curation_submodular matches a literal Set-based greedy loop") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1)
        val shingles = if (t.length <= 5) Set(t) else t.sliding(5).toSet
        r.getLong(0) -> shingles
      }
    var covered = Set.empty[String]
    var picked = Set.empty[Long]
    val expected = (1 to 3).map { round =>
      val (doc, gain) = docs.filter(d => !picked(d._1))
        .map(d => (d._1, (d._2 -- covered).size))
        .maxBy(d => (d._2, -d._1))
      // the query documents ">= 3 docs with positive marginal gain" as a
      // precondition (Round14Ops5) and drops zero-gain rounds from the
      // output; this Set-based replay would still pick a 0-gain doc, so
      // fail with the precondition named instead of a confusing row diff
      // (ADVICE r14)
      assert(gain > 0, s"corpus violates q_curation_submodular's " +
        s"documented precondition: round $round has no positive-gain doc")
      covered ++= docs.find(_._1 == doc).get._2
      picked += doc
      (round.toLong, doc, gain.toLong, covered.size.toLong)
    }
    val got = SparkEntry.queries("q_curation_submodular")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected,
      s"greedy rounds: ${got.toSeq} vs $expected")
    // diminishing returns: marginal gains never increase round-over-round
    assert(got(0)._3 >= got(1)._3 && got(1)._3 >= got(2)._3)
  }
}
