package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.RuntimeFilters

/** Round-17 batch 6: DELETION against the dedup store — canonical
  * RE-ELECTION. The round's maintenance theme (ANN insert/delete/churn)
  * applied to the other standing store a pipeline keeps: the dedup
  * registry that maps every content digest to its canonical document
  * (min doc_id — the copy that survives dedup). When an erasure batch
  * lands (a source takedown, a GDPR request), groups whose CANONICAL
  * was deleted must re-elect (the next-smallest surviving member takes
  * over as the copy future dedup keeps), groups that lost only
  * non-canonical members are unchanged, and groups with no survivors
  * vanish from the registry.
  *
  * Digest granularity: the sorted-distinct-word-set md5 (the
  * bag-of-words exact-dup key — template documents sharing a
  * vocabulary collide; the synthetic corpus has groups up to ~29
  * members, with canonical-deleted groups at every SF, so re-election
  * is genuinely exercised). Erasure batch: doc_id % 7 = 3 (~14 %,
  * SF-stable).
  *
  * Delta shape (the scale story): recomputation touches ONLY affected
  * digests — the distinct digests of the erasure batch. The standing
  * corpus is bloom-pruned by the batch's digests BEFORE its shuffle
  * (the q_dedup_incremental posture: at the real asymmetry standing ≫
  * batch, the corpus-side shuffle is the whole cost and the sketch
  * deletes all of it except true matches), then exactly restricted by
  * the digest semi-join. Re-election itself is two partial-agg min/count
  * passes over the affected groups — O(|affected|), never O(corpus).
  */
object Round17Ops6 {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_canonical_delete",
      (s, d) => {
        val docs0 = Tables.documents(s, d).select(col("doc_id"),
          md5(concat_ws(" ",
            sort_array(array_distinct(split(col("text"), " "))))
            .cast("binary")).as("h"))
        val isDel = col("doc_id") % 7 === 3
        val del = docs0.filter(isDel)
        val affected = del.select("h").distinct()
        val docs = RuntimeFilters
          .bloomPruned(docs0, col("h"), del, col("h"),
            expectedItems = 100000L)
          .join(affected, "h")
        val before = docs.groupBy("h")
          .agg(min("doc_id").as("old_canon"), count(lit(1)).as("n_before"))
        val after = docs.filter(!isDel).groupBy("h")
          .agg(min("doc_id").as("new_canon"), count(lit(1)).as("n_surv"))
        before.join(after, Seq("h"), "left")
          .select(col("h").as("digest"), col("old_canon"), col("new_canon"),
            col("n_before"),
            (col("n_before") - coalesce(col("n_surv"), lit(0L))).as("n_lost"),
            coalesce(col("n_surv"), lit(0L)).as("n_survivors"),
            when(col("new_canon").isNull, "emptied")
              .when(col("new_canon") =!= col("old_canon"), "reelected")
              .otherwise("unchanged").as("outcome"))
          .orderBy("digest")
      },
      """WITH d AS (SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h
        |  FROM documents),
        |aff AS (SELECT DISTINCT h FROM d WHERE doc_id % 7 = 3),
        |bef AS (SELECT h, min(doc_id) AS old_canon, count(*) AS n_before
        |        FROM d JOIN aff USING (h) GROUP BY h),
        |aft AS (SELECT h, min(doc_id) AS new_canon, count(*) AS n_surv
        |        FROM d JOIN aff USING (h) WHERE doc_id % 7 <> 3 GROUP BY h)
        |SELECT b.h AS digest, b.old_canon, a.new_canon,
        |  b.n_before::BIGINT AS n_before,
        |  (b.n_before - coalesce(a.n_surv, 0))::BIGINT AS n_lost,
        |  coalesce(a.n_surv, 0)::BIGINT AS n_survivors,
        |  CASE WHEN a.new_canon IS NULL THEN 'emptied'
        |       WHEN a.new_canon <> b.old_canon THEN 'reelected'
        |       ELSE 'unchanged' END AS outcome
        |FROM bef b LEFT JOIN aft a USING (h) ORDER BY digest""".stripMargin))
}
