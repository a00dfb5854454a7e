package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming delete/retention propagation — the right-to-be-forgotten
  * loop run continuously instead of as a batch repair (the
  * `q_delete_propagate` twin; reference scope: the ETL keeps only an
  * append-only MySQL sink, `etl_elb_log_to_mysql.py:152-160` — delete
  * propagation is engine extension surface).
  *
  * Standing state, the two assets a production ingest pipeline already
  * maintains:
  *   - `members` (doc_id, h): the per-document digest index (the same
  *     frame incremental dedup appends to);
  *   - `summary` (h, n, keep): the dedup store — group cardinality and
  *     elected keeper, with the INVARIANT keep = min(doc_id) over the
  *     group's live members (initial build elects min; re-election
  *     below preserves it).
  *
  * Each tombstone micro-batch (bare doc_ids — a GDPR feed carries
  * nothing else) repairs both stores incrementally, the batch query's
  * discipline re-expressed per batch:
  *   - decrements come from the tombstones alone (join members → dead
  *     digests, count per h);
  *   - keeper death is detected SET-WISE: min(dead) = keep ⟺ the
  *     keeper is among this batch's dead (keep is the group min, so if
  *     it died it is also the dead min) — no per-row membership probe;
  *   - re-election is semi-join-pruned to keeper-died groups with
  *     survivors, and takes min(doc_id) — restoring the invariant;
  *   - groups whose count reaches zero leave the summary store.
  *
  * Scale shape per batch: the tombstone side is tiny (broadcast), so
  * the members semi/anti joins are map-side filters — the member store
  * never shuffles; the summary join and the pruned re-election shuffle
  * only the AFFECTED digests. The spec's parquet overwrite stands in
  * for a production merge-on-read table (append tombstone partitions,
  * compact later) — the repair plan is identical either way.
  */
object DeleteStreams {

  /** Applies one micro-batch of tombstoned doc_ids to the standing
    * stores; returns (members', summary'), UNMATERIALIZED — the caller
    * decides the persistence boundary (the spec eagerly checkpoints
    * before overwriting the backing parquet; a merge-on-read store
    * would write only the delta).
    *
    * Idempotent per batch: ids already deleted (or never present)
    * semi-join to nothing and repair is a no-op — a replayed tombstone
    * file cannot corrupt the stores.
    */
  def applyTombstones(tombstones: DataFrame, members: DataFrame,
      summary: DataFrame): (DataFrame, DataFrame) = {
    val ids = broadcast(tombstones.select("doc_id").distinct())
    val dead = members.join(ids, Seq("doc_id"), "leftsemi")
    val survivors = members.join(ids, Seq("doc_id"), "leftanti")
    val delH = dead.groupBy("h")
      .agg(count(lit(1)).as("n_del"), min("doc_id").as("min_dead"))
    val aff = summary.join(delH, "h")
      .withColumn("new_n", col("n") - col("n_del"))
    val needRe = aff
      .filter(col("min_dead") === col("keep") && col("new_n") > 0)
      .select("h")
    val re = survivors.join(needRe, Seq("h"), "leftsemi")
      .groupBy("h").agg(min("doc_id").as("re_keep"))
    val updated = aff.filter(col("new_n") > 0)
      .join(re, Seq("h"), "left")
      .select(col("h"), col("new_n").as("n"),
        when(col("min_dead") === col("keep"), col("re_keep"))
          .otherwise(col("keep")).as("keep"))
    val untouched = summary.join(delH.select("h"), Seq("h"), "leftanti")
      .select("h", "n", "keep")
    (survivors, untouched.unionAll(updated))
  }
}
