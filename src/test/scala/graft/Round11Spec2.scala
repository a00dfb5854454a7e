package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.functions._

/** Contracts for the round-11 operator batch (DSIR importance weights,
  * Bloom reference-set dedup, fixed-k reservoir). */
class Round11Spec2 extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      case q: QueryStageExec => collectAll(q.plan)(pf)
      case r: ReusedExchangeExec => collectAll(r.child)(pf)
    }.flatten
    here ++ nested
  }

  test("q_curation_dsir: weights favor the target (en) slice and are finite") {
    val rows = run("q_curation_dsir").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val w = r.getAs[Double]("logweight")
      assert(!w.isNaN && !w.isInfinite, s"non-finite weight: $r")
      assert(r.getAs[Long]("n_tokens") > 0)
    }
    // the selected top-20 must be en-enriched vs the corpus base rate:
    // DSIR's whole point is that high-weight docs look like the target
    val langs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enTop = rows.count(r => langs(r.getLong(0)) == "en")
    val enBase = langs.valuesIterator.count(_ == "en").toDouble / langs.size
    assert(enTop.toDouble / 20 > enBase,
      s"top-20 en fraction ${enTop / 20.0} must beat base rate $enBase")
  }

  test("q_dedup_bloom: contract booleans hold and membership counts are exact") {
    val rows = run("q_dedup_bloom").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("no_false_neg"), s"false negative in $r")
      assert(r.getAs[Boolean]("fpr_ok"), s"FPR out of bound in $r")
      assert(r.getAs[Long]("n_members") <= r.getAs[Long]("n_docs"))
    }
    // every reference-shard doc is its own member → members ≥ ref docs
    val nRef = Tables.documents(spark, sf).filter(col("doc_id") % 3 === 0).count()
    assert(rows.map(_.getAs[Long]("n_members")).sum >= nRef)
  }

  test("q_sample_reservoir: exactly k per group, deterministic, WindowGroupLimit plan") {
    val df = run("q_sample_reservoir")
    val rows = df.collect()
    val perSource = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, n) =>
      assert(n == math.min(5L, sizes(src)), s"$src: $n of ${sizes(src)}")
    }
    // rerun → identical selection (deterministic md5 key)
    assert(run("q_sample_reservoir").collect().toSeq == rows.toSeq)
    val plan = df.queryExecution.executedPlan
    assert(collectAll(plan) { case w: WindowGroupLimitExec => w }.nonEmpty,
      "rk<=5 must prune via WindowGroupLimit")
  }
}
