package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style MERGE (upsert) as a pure dataflow: apply a batch of
  * whole-row updates/inserts to a base relation without a table format —
  * the read-side complement of `q_upsert_latest` (which compacts an
  * event LOG to latest state; this merges a DELTA into a SNAPSHOT).
  *
  * Semantics: rows present in `updates` replace the matching base row
  * ENTIRELY (CDC images are whole rows — a null column in an update is
  * an update to null, so no per-column coalesce); update rows with no
  * base match are inserts; base rows with no update pass through.
  *
  * Scale: one full-outer shuffle join on the merge keys — both sides
  * partition by the key, no broadcast requirement, no driver state. For
  * repeated merges against the same base, bucket the base on the key
  * (BucketingSpec) and only the delta shuffles.
  */
object Merge {

  /** Merge `updates` into `base` (same schema). `keys` must be non-null
    * in both inputs and unique per input. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(base.columns.sameElements(updates.columns),
      s"schemas must match: ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val fromUpdate = col(s"u.${keys.head}").isNotNull
    val merged = base.columns.map { c =>
      when(fromUpdate, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
    }
    base.as("b").join(updates.as("u"), cond, "full_outer")
      .select(merged.toIndexedSeq: _*)
  }

  /** EXECUTE a `MERGE INTO` statement against a session-catalog table
    * (round 16 — the write-side completion of the MERGE rung). The
    * statement goes through the normal SQL path, where
    * [[graft.plans.MergePreviewRule]] rewrites it to the post-merge
    * READ plan; this materializes that plan and overwrites the target
    * with it — preview + commit, the two halves every merge engine has.
    *
    * Ordering contract: the preview is EAGERLY materialized (checkpoint)
    * BEFORE the overwrite touches the table it reads from — the same
    * read-then-clobber discipline as the streaming stores. A
    * strict-cardinality violation (`spark.sql.graft.merge.
    * strictCardinality=true`) therefore raises DURING materialization,
    * before a single target byte is replaced: failed merges leave the
    * table untouched (spec-pinned in Round16Spec2).
    *
    * Scale note: on a real cluster the commit for a parquet table is a
    * full rewrite (parquet has no row-level ops — that is WHY formats
    * like Delta/Iceberg exist); partition the target and merge per
    * partition to bound the rewrite, exactly as a production parquet
    * upsert job does. */
  def executeInto(s: org.apache.spark.sql.SparkSession, mergeSql: String,
      targetTable: String): Unit = {
    val preview = s.sql(mergeSql).localCheckpoint(eager = true)
    preview.write.mode("overwrite").insertInto(targetTable)
  }
}
