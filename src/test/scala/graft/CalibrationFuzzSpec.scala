package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-fuzz for the six calibration-oracle queries (VERDICT r11
  * task #8): their DuckDB oracles pin the within-tolerance booleans as
  * constant TRUE, so a silent sketch-parameter regression could hide
  * behind a stable hash as long as the FIXTURE corpus stays put. This
  * spec perturbs the corpus three ways — drop 10% of rows, duplicate
  * 30% (documents re-id'd past max, modelling true exact-dups; fact
  * rows duplicated verbatim, modelling at-least-once delivery), and
  * permute physical row order — and asserts every calibration boolean
  * still holds, i.e. the tolerance claims are properties of the
  * OPERATOR, not artifacts of one frozen corpus.
  *
  * q_window_countdistinct_approx has no boolean (its HLL estimate is
  * exactly the distinct count at priority cardinality <= 5), so its
  * fuzz case compares the estimate against an exact collect_set twin
  * row-by-row on the perturbed corpus.
  */
class CalibrationFuzzSpec extends SparkSpec {

  private def perturb(df: DataFrame, mode: String, idCol: Option[String]): DataFrame =
    mode match {
      case "drop" => df.sample(withReplacement = false, 0.9, 42L)
      case "dup" => idCol match {
        case Some(c) =>
          val mx = df.agg(max(col(c))).head().getLong(0)
          df.unionAll(df.sample(withReplacement = false, 0.3, 7L)
            .withColumn(c, col(c) + lit(mx + 1L)))
        case None => df.unionAll(df.sample(withReplacement = false, 0.3, 7L))
      }
      case "perm" => df.repartition(13)
    }

  /** sf0.001 with the four input tables perturbed; built once per mode. */
  private lazy val dirs: Map[String, String] = Seq("drop", "dup", "perm").map { mode =>
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-fuzz-$mode").toString
    Seq("lineitem" -> None, "orders" -> None, "events" -> None,
      "documents" -> Some("doc_id")).foreach { case (t, id) =>
      perturb(spark.read.parquet(s"$sf/$t.parquet"), mode, id)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    mode -> tmp
  }.toMap

  private val boolCols = Map(
    "q_agg_approx" -> Seq("parts_within_5pct", "supps_within_5pct"),
    "q_agg_hll_union" -> Seq("est_within_1pct"),
    "q_agg_percentile_approx" -> Seq("p50_in_band", "p90_in_band", "p25_in_band"),
    "q_dedup_simhash" -> Seq("pairs_found", "hamming_cut_ok", "lsh_filters",
      "family_count_agree", "family_overlap_ok"),
    "q_text_compression" -> Seq("ratio_in_range", "deflate_bounded"))

  for ((name, cols) <- boolCols.toSeq.sortBy(_._1); mode <- Seq("drop", "dup", "perm"))
    test(s"$name calibration holds under corpus $mode") {
      val df = SparkEntry.queries(name)(spark, dirs(mode))
      val bad = df.filter(
        cols.map(c => not(coalesce(col(c), lit(false)))).reduce(_ || _))
      val badRows = bad.collect()
      assert(badRows.isEmpty,
        s"$name/$mode: ${badRows.length} rows fail calibration: ${badRows.take(3).mkString("; ")}")
    }

  for (mode <- Seq("drop", "dup", "perm"))
    test(s"q_window_countdistinct_approx estimate stays exact under corpus $mode") {
      import org.apache.spark.sql.expressions.Window
      val approx = SparkEntry.queries("q_window_countdistinct_approx")(spark, dirs(mode))
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val exact = Tables.orders(spark, dirs(mode))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          size(collect_set(col("o_orderpriority")).over(w)).cast("long")
            .as("approx_priorities"))
        .orderBy("o_orderkey")
      assert(approx.collect().toSeq == exact.collect().toSeq)
    }
}
