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
}
