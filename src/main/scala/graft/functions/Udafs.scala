package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate (SURVEY.md §2.B q_udaf): discounted revenue
  * `sum(price * (1 - discount))` accumulated in EXACT integer units
  * (price cents × discount basis points) so the result is identical under
  * any partial-aggregation order — the property that makes it safe for
  * Spark's two-phase (partial/final) distributed aggregation at any scale.
  *
  * Equivalent SQL (the oracle):
  *   SUM(CAST(price AS DECIMAL(18,2)) * (1 - CAST(disc AS DECIMAL(18,2))))::DOUBLE
  */
object DiscountedRevenue extends Aggregator[(Double, Double), Long, Double] {
  override def zero: Long = 0L
  override def reduce(buf: Long, in: (Double, Double)): Long =
    buf + Math.round(in._1 * 100) * (100L - Math.round(in._2 * 100))
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(buf: Long): Double = buf / 1e4
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Udafs {
  /** Column form: discounted_revenue(price, discount). */
  lazy val discountedRevenue: (Column, Column) => Column = {
    val f = udaf(DiscountedRevenue)
    (price, disc) => f(price, disc)
  }
}
