package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 4: cross-source duplicate overlap — the provenance
  * diagnostic a datacard needs before mixing sources: how much of the
  * exact-duplicate mass SPANS source boundaries (scraped mirrors,
  * syndicated content) vs lives inside one source (re-crawls). A pair
  * of sources sharing many digests should be deduplicated jointly, not
  * per-source.
  */
object Round10Ops4 {

  val defs: Seq[QueryDef] = Seq(

    // For every source pair (s1 ≤ s2): the number of distinct content
    // digests present in BOTH (s1 = s2 counts digests duplicated
    // WITHIN the source, i.e. ≥ 2 docs there). The digest is the
    // 256-char PREFIX md5 — the q_dedup_prefix granularity: this
    // corpus's planted near-dups share prefixes, not full texts, and
    // prefix identity is the cross-source mirror signal real crawls
    // show (same article, different footer). Scale shape: documents
    // never shuffle — only (16-byte digest, source) pairs do; the
    // distinct collapses each source's copies first, so the per-digest
    // source list is bounded by |sources|, and the pair explode is
    // |sources|²-bounded per digest (explicitly NOT doc²). Output is
    // ≤ |sources|² rows.
    QueryDef("q_dedup_cross_sources",
      (s, d) => {
        val ds = Tables.documents(s, d)
          .select(md5(substring(col("text"), 1, 256)).as("digest"), col("source"),
            col("doc_id"))
        val perSource = ds
          .groupBy("digest", "source").agg(count(lit(1)).as("n_docs"))
        val pairs = perSource.as("x").join(perSource.as("y"),
            expr("x.digest = y.digest AND x.source <= y.source"))
          .filter(
            // same-source row = within-source duplication: require >= 2
            // docs; cross-source rows pair distinct sources
            expr("x.source < y.source OR x.n_docs >= 2"))
          .select(col("x.source").as("src1"), col("y.source").as("src2"))
        pairs.groupBy("src1", "src2")
          .agg(count(lit(1)).as("n_shared_digests"))
          .orderBy("src1", "src2")
      },
      """WITH ds AS (
        |  SELECT md5(substr(text, 1, 256)) AS digest, source, count(*) AS n_docs
        |  FROM documents GROUP BY 1, 2)
        |SELECT x.source AS src1, y.source AS src2,
        |  count(*) AS n_shared_digests
        |FROM ds x JOIN ds y ON x.digest = y.digest AND x.source <= y.source
        |WHERE x.source < y.source OR x.n_docs >= 2
        |GROUP BY 1, 2 ORDER BY src1, src2""".stripMargin))
}
