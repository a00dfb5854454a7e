package graft

import org.apache.spark.sql.functions._

/** Round-17 pin for the compaction metric: the twice-maintained index
  * must still be NEAR the from-scratch build on the same corpus — the
  * whole point of the drift readout is that a healthy incremental path
  * keeps drift near zero until a rebuild is actually warranted.
  * Measured at the gate corpora: drift = 0.0 on all 8 queries
  * (recall 1.0 both sides at N=500 and N=2000-class corpora); the pin
  * allows a small tolerance, not equality — drift is an empirical
  * readout, not a structural guarantee (the Round16Spec discipline).
  */
class Round17Spec4 extends SparkSpec {
  test("2-batch maintained index: recall holds the bar, drift stays small") {
    val df = SparkEntry.queries("q_similarity_hnsw_drift")(spark, sf)
    val row = df.agg(avg("recall_inc"), avg("recall_scratch"), avg("drift"))
      .head()
    val (inc, scr, drift) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    info(f"recall_inc=$inc%.3f recall_scratch=$scr%.3f drift=$drift%.3f")
    assert(inc >= 0.90, s"2-batch maintained recall $inc below the 0.90 bar")
    assert(math.abs(drift) <= 0.10,
      s"drift $drift exceeds the 0.10 rebuild-signal tolerance at the spec corpus")
  }
}
