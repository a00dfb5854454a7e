package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session (one per suite) mirroring the harness config —
  * including GraftExtensions, exactly as Verify/Bench build theirs (the
  * parser extension in particular cannot be added post-hoc, so the
  * QUALIFY frontend is only testable when the FIRST session of the JVM
  * carries it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
