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
    * WRITE-AUDIT-PUBLISH (round-16 ADVICE — the localCheckpoint staging
    * of the first cut was executor-local and unreplicated, so on a real
    * cluster a lost executor after the target truncation would have
    * recomputed the preview THROUGH the clobbered table): the preview
    * is now staged as PARQUET to a scratch path first (write), re-read
    * from those bytes (audit — also where a strict-cardinality
    * violation raises, before a single target byte is replaced), and
    * only then published over the target. The staged file is durable
    * storage, not executor memory: a task retry during the publish
    * re-reads staged bytes, never the clobbered table. On a cluster,
    * point `spark.sql.graft.merge.stagingDir` at shared storage (object
    * store / DFS); unset, staging falls back to a driver-local temp dir,
    * which is only reachable by executors under local[n].
    *
    * Scale note: this commit is still a full-table rewrite (parquet has
    * no row-level ops — that is WHY formats like Delta/Iceberg exist);
    * [[executeIntoPartitioned]] is the bounded variant that rewrites
    * only the partitions the merge touched. */
  def executeInto(s: org.apache.spark.sql.SparkSession, mergeSql: String,
      targetTable: String): Unit = {
    val staged = stagePreview(s, s.sql(mergeSql))
    try staged.df.write.mode("overwrite").insertInto(targetTable)
    finally staged.cleanup()
  }

  /** Partitioned MERGE-execute (round 17 — the bounded-rewrite variant
    * [[executeInto]]'s scaladoc promises): against a target table
    * PARTITIONED BY `partCol`, publish via DYNAMIC partition overwrite
    * restricted to `affected` partition values, so only partitions
    * containing merge matches/inserts are rewritten — untouched
    * partitions' files are never opened for write (Round17Spec pins
    * them byte-identical across the merge).
    *
    * `affected` is the partition set the DELTA lands in — the caller
    * computes it from the merge source (a distinct over the source's
    * partition expression; production parquet upsert jobs know their
    * delta's partitions the same way). Correctness does not depend on
    * it being minimal, only on it being COMPLETE: a partition value the
    * delta touches that is missing from `affected` would keep its
    * pre-merge files (the filter drops its preview rows before the
    * write). Completeness is the caller's contract and is not
    * re-derived here — deriving it generically would mean diffing the
    * preview against the target, a full extra pass that defeats the
    * bounded rewrite.
    *
    * Read-side bonus: the `partCol IN affected` filter pushes through
    * the preview's projections into the target scan (partition columns
    * pass through MERGE updates unassigned), so the survivor branch
    * PRUNES unaffected partitions on read as well — the whole merge
    * touches O(affected) data, not O(table). */
  def executeIntoPartitioned(s: org.apache.spark.sql.SparkSession,
      mergeSql: String, targetTable: String, partCol: String,
      affected: Seq[Any]): Unit = {
    require(affected.nonEmpty, "partitioned merge: no affected partitions")
    val preview = s.sql(mergeSql)
      .filter(col(partCol).isin(affected: _*))
    val staged = stagePreview(s, preview)
    val prior = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      staged.df.write.mode("overwrite").insertInto(targetTable)
    } finally {
      prior match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      staged.cleanup()
    }
  }

  /** A staged preview: the re-read parquet frame + its scratch-dir
    * cleanup. */
  private final case class Staged(df: DataFrame, cleanup: () => Unit)

  /** Write `preview` to a scratch parquet path and hand back the
    * re-read frame (the write-audit-publish staging step shared by both
    * execute variants). The scratch root is
    * `spark.sql.graft.merge.stagingDir` when set (shared storage on a
    * cluster), else a driver-local temp dir; either way each call gets
    * a fresh unique subpath, deleted by `cleanup()` after publish. */
  private def stagePreview(s: org.apache.spark.sql.SparkSession,
      preview: DataFrame): Staged = {
    val path = s.conf.getOption("spark.sql.graft.merge.stagingDir") match {
      case Some(root) =>
        root.stripSuffix("/") + "/merge-stage-" + java.util.UUID.randomUUID()
      case None =>
        java.nio.file.Files.createTempDirectory("graft-merge-stage")
          .resolve("stage").toString
    }
    preview.write.mode("overwrite").parquet(path)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    Staged(s.read.parquet(path), () => { fs.delete(hPath, true); () })
  }
}
