package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q_delete_propagate contract: the incrementally repaired stores equal
  * the stores REBUILT from the purged corpus — for the dedup digest
  * store (count + keeper) and the full per-term postings stats (df +
  * top posting). The audit row semantics (new_n = 0 means the entry
  * leaves the store) are exercised by construction: the comparison
  * applies the audit to the old store and diffs against the rebuild. */
class DeletePropagateSpec extends SparkSpec {

  private def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"), md5(col("text").cast("binary")).as("h"))

  private val isDead = col("doc_id") % 37 === 3

  test("audit covers every store entry that changes, and only those") {
    val audit = SparkEntry.queries("q_delete_propagate")(spark, sf)
    val byKind = audit.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.getOrElse("corpus", 0L) == 1L)
    assert(byKind.getOrElse("digest", 0L) > 0)
    assert(byKind.getOrElse("term", 0L) > 0)
    // every audited digest row really lost n_del = old_n - new_n members
    val bad = audit.filter(col("kind") === "digest" && col("new_n") >= col("old_n"))
    assert(bad.count() == 0, "a digest audit row lost no members")
  }

  test("digest store: audit applied to old store == store rebuilt from purged corpus") {
    val audit = SparkEntry.queries("q_delete_propagate")(spark, sf)
    val oldStore = docs.groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
    // apply the audit: replace affected entries, drop new_n = 0
    val repaired = oldStore
      .join(audit.filter(col("kind") === "digest")
          .select(col("key").as("h"), col("new_n"), col("new_keep")),
        Seq("h"), "left")
      .select(col("h"),
        coalesce(col("new_n"), col("n")).as("n"),
        coalesce(when(col("new_n").isNotNull, col("new_keep")), col("keep")).as("keep"))
      .filter(col("n") > 0)
    val rebuilt = docs.filter(!isDead).groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
    val diff = repaired.exceptAll(rebuilt).count() + rebuilt.exceptAll(repaired).count()
    assert(diff == 0, s"digest store repair != rebuild ($diff diff rows)")
  }

  test("postings: audit applied to old stats == stats rebuilt from purged corpus") {
    val audit = SparkEntry.queries("q_delete_propagate")(spark, sf)
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    def stats(f: DataFrame): DataFrame = {
      val byTerm = Window.partitionBy("term")
      f.select(col("term"), col("doc_id"),
          row_number().over(byTerm.orderBy(col("tf").desc, col("doc_id").asc)).as("rn"),
          count(lit(1)).over(byTerm).as("df"))
        .filter(col("rn") === 1)
        .select(col("term"), col("df"), col("doc_id").as("keep"))
    }
    val oldStats = stats(tf)
    val repaired = oldStats
      .join(audit.filter(col("kind") === "term")
          .select(col("key").as("term"), col("new_n"), col("new_keep")),
        Seq("term"), "left")
      .select(col("term"),
        coalesce(col("new_n"), col("df")).as("df"),
        coalesce(when(col("new_n").isNotNull, col("new_keep")), col("keep")).as("keep"))
      .filter(col("df") > 0)
    val rebuilt = stats(tf.filter(col("doc_id") % 37 =!= 3))
    val diff = repaired.exceptAll(rebuilt).count() + rebuilt.exceptAll(repaired).count()
    assert(diff == 0, s"postings repair != rebuild ($diff diff rows)")
  }
}
