package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-round state materialization for iterative graph loops
  * (pagerank / labelprop rounds and their edge substrates).
  *
  * Default (`memory`): eager localCheckpoint — the round-13 rule
  * (lazy checkpoints do not truncate lineage under AQE; each round
  * re-executed its predecessors, SCALING.md §round-13 finding 1).
  * Blocks live MEMORY_AND_DISK-deserialized in the executor block
  * manager, which is what hits the single-box ~64 GB residency wall
  * at 60×–100× corpus factors (SCALING.md §round-14: rep-to-rep
  * spreads up to 3.2× once inputs + round blocks approach half of
  * box RAM and full GCs dominate).
  *
  * `spark.graft.graph.roundState=disk`: the round instead persists
  * StorageLevel.DISK_ONLY and materializes immediately. The
  * CacheManager substitutes the materialized relation into every
  * later round's plan (the same lineage-truncation effect — an
  * InMemoryRelation plans as a leaf and PRESERVES the child's output
  * partitioning, so the repartition(src)-before-checkpoint zero-
  * shuffle edge reuse still holds), but the blocks are serialized to
  * local disk and never occupy unified storage memory — per-round
  * state stops competing with shuffle/execution memory, which is the
  * disk-backed regime a >RAM single box (or a disk-heavy cluster
  * node) needs. Measured in SCALING.md §round-15 at 60×/100×.
  *
  * Content is identical either way (materialization strategy only);
  * Round15Spec2 pins disk == memory on a real query.
  */
object RoundState {

  def of(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.graph.roundState", "memory") match {
      case "disk" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        p.count() // materialize now — later rounds must plan against the
                  // cached relation, not race to recompute it
        p
      case _ => df.localCheckpoint(eager = true)
    }
}
