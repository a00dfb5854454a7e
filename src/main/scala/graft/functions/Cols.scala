package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small shared Column helpers. */
object Cols {
  /** ts + n microseconds, exactly (micros must be integral). Spark's Scala
    * `functions` has no timestampadd; a day-time interval add is the
    * codegen-friendly equivalent. */
  def addMicros(ts: Column, micros: Column): Column =
    ts + make_dt_interval(lit(0), lit(0), lit(0),
      (micros.cast("decimal(24,0)") / lit(1000000)).cast("decimal(18,6)"))

  def addSeconds(ts: Column, secs: Column): Column =
    ts + make_dt_interval(lit(0), lit(0), lit(0), secs.cast("decimal(18,6)"))
}
