package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.UaClassifier

/** AWS ALB access-log parser — the reference engine's entire dataflow
  * (`/root/reference/etl_elb_log_to_mysql.py:64-131`, operators A3-A13 in
  * SURVEY.md §2.A) re-expressed as a single declarative Spark projection.
  *
  * Design notes (Spark-first, 100 TB-ready):
  *   - Tokenization (shlex.split at reference `:66`) becomes a `from_csv`
  *     with `sep=" "`, `quote='"'`, `escape='\\'` — whitespace-delimited,
  *     double-quote-aware, exactly the shell-quoting subset ALB emits. This
  *     runs inside whole-stage codegen; no UDF, no Python, no row loop.
  *   - All 13 derivations (reference `:71-128`) are Catalyst expressions, so
  *     Catalyst can prune/push/fuse them, and the whole parse is one narrow
  *     stage: it scales linearly with input splits and never shuffles.
  *   - Malformed-line semantics match the reference: <15 tokens → drop
  *     (`:67-69`), unparseable timestamp → drop (`:81-83`); guarded casts
  *     map non-numeric to 0 / 0.0 (`:43-50`).
  *   - Note for scale: `.gz` inputs are NOT splittable — one task per file.
  *     That matches ALB's many-small-files layout (good parallelism), but for
  *     few huge archives prefer re-staging to parquet via [[readLogs]] +
  *     `repartition` before heavy downstream work.
  */
object AlbLogParser {

  /** Token schema bounded to what the relation consumes: ALB emits 29-30
    * fields, but only t0..t14 feed the 13 derivations, so the parse stores
    * exactly 15 — tokens beyond the schema are scanned but never
    * materialized (PERMISSIVE), which skips writing ~20 dead string slots
    * per row into the tokenized struct; missing tokens are null, and
    * arity>=15 is enforced via `t14 IS NOT NULL`. Quote/escape tokenization
    * is strictly left-to-right, so truncating the schema cannot change how
    * the consumed prefix parses. */
  private val nTokens = 15
  private val tokenSchema = StructType(
    (0 until nTokens).map(i => StructField(s"t$i", StringType, nullable = true)))

  private val csvOptions = Map(
    "sep" -> " ",
    "quote" -> "\"",
    "escape" -> "\\",
    "mode" -> "PERMISSIVE")

  /** Reference `to_int` (`:43-44`): digits-only strings parse, everything
    * else (incl. "-", "-1", "") → 0. Unit-tested by the reference at
    * `tests/test_utils.py:4-7`. The digit-count bound keeps the guarded
    * cast overflow-free under ANSI mode (python ints are unbounded; values
    * beyond the target type map to the 0 sentinel instead of throwing). */
  def guardedInt(c: Column): Column =
    when(c.rlike("^[0-9]{1,9}$"), c.cast("int")).otherwise(lit(0))

  def guardedLong(c: Column): Column =
    when(c.rlike("^[0-9]{1,18}$"), c.cast("long")).otherwise(lit(0L))

  /** Reference `to_float` (`:46-50`): python float() accepts negatives and
    * scientific notation; failures → 0.0. Tested at `tests/test_utils.py:9-12`. */
  def guardedDouble(c: Column): Column =
    when(c.rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
      c.cast("double")).otherwise(lit(0.0))

  /** Read raw ALB log files (gzip auto-decoded by extension) as one line per
    * row, carrying the origin file — reference operators A1-A3. The
    * reference swallows per-file read errors and skips the file
    * (`:137,146-147`); `ignoreCorruptFiles` reproduces that semantics at
    * the datasource level. */
  def readLogs(spark: SparkSession, path: String,
               skipCorruptFiles: Boolean = true): DataFrame =
    spark.read
      .option("pathGlobFilter", "*.gz")
      .option("ignoreCorruptFiles", skipCorruptFiles.toString)
      .textFile(path)
      .toDF("value")
      .withColumn("_source", input_file_name())

  /** [[parse]] plus skip-count observability (reference A20: per-stage
    * INFO/WARN logging of dropped rows, `etl_elb_log_to_mysql.py:68,82,145`)
    * via `observe()` — metrics are collected executor-side with zero extra
    * passes; read them after an action with `Observation.get`. */
  def parseObserved(lines: DataFrame, lineCol: String = "value",
                    sourceCol: Column = input_file_name())
      : (DataFrame, org.apache.spark.sql.Observation, org.apache.spark.sql.Observation) = {
    val inObs = new org.apache.spark.sql.Observation("alb_in")
    val outObs = new org.apache.spark.sql.Observation("alb_out")
    val observed = lines.observe(inObs, count(lit(1)).as("rows_in"))
    val parsed = parse(observed, lineCol, sourceCol)
      .observe(outObs, count(lit(1)).as("rows_out"))
    (parsed, inObs, outObs)
  }

  /** Parse a DataFrame of raw log lines into the 13-column `elb_log_data`
    * relation (schema in SURVEY.md §1.3 / FIXTURES.md §2).
    *
    * @param lines     input frame
    * @param lineCol   column holding the raw log line
    * @param sourceCol expression for `log_source_file` (reference `:127`)
    */
  def parse(lines: DataFrame, lineCol: String = "value",
            sourceCol: Column = input_file_name()): DataFrame = {
    // Tokenize ONCE per row. The struct is flattened through inline() — a
    // Generate node — because CollapseProject would otherwise inline the
    // from_csv call into every downstream field reference, and conditional
    // contexts (when/coalesce) defeat codegen subexpression elimination:
    // measured ~10× re-tokenization per row without this barrier.
    val tok = from_csv(col(lineCol), tokenSchema, csvOptions)
    val withTok = lines
      .select(sourceCol.as("_src_file"), inline(array(tok)))
    val t = (i: Int) => col(s"t$i")

    // Multi-format timestamp parse (UTC) then shift to Eastern (reference
    // `:72-83`). Requires session tz = UTC (pinned by the harness) so the
    // pattern-parse interprets the wall-clock as UTC.
    // Semantically a two-format fallback (with/without fraction, trailing Z)
    // but implemented as normalize-then-parse-once: the naive
    // coalesce(try_to_timestamp(fmt1), try_to_timestamp(fmt2)) throws and
    // catches a JVM exception internally for EVERY no-fraction row, which
    // dominates parse cost at scale.
    // strip a trailing Z without a per-row regex (this runs on every line)
    val noZ = when(t(1).endsWith("Z"),
      t(1).substr(lit(1), length(t(1)) - 1)).otherwise(t(1))
    val norm = when(noZ.contains("."), noZ).otherwise(concat(noZ, lit(".000000")))
    val tsUtc = when(t(1).endsWith("Z"),
      try_to_timestamp(norm, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")))
    val tsEastern = from_utc_timestamp(tsUtc, "America/New_York")

    // "METHOD URL HTTP/x.y" → method + url path (reference `:100-106`):
    // maxsplit=2 then len>=2 check; else Unknown/"".
    val reqParts = split(t(12), " ", 3)
    val hasUrl = size(reqParts) >= 2
    val method = when(hasUrl, try_element_at(reqParts, lit(1))).otherwise(lit("Unknown"))
    val path = when(hasUrl,
      coalesce(try_parse_url(try_element_at(reqParts, lit(2)), lit("PATH")), lit("")))
      .otherwise(lit(""))

    val ua = coalesce(t(13), lit(""))

    withTok
      .filter(t(14).isNotNull)   // arity >= 15 (reference `:67-69`)
      .filter(tsUtc.isNotNull)   // unparseable timestamp drops row (`:81-83`)
      .select(
        tsEastern.as("log_timestamp"),
        substring_index(t(3), ":", 1).as("client_ip"),
        method.as("http_method"),
        path.as("requested_path"),
        guardedInt(t(8)).as("elb_status_code"),
        guardedInt(t(9)).as("backend_status_code"),
        bround((guardedDouble(t(5)) + guardedDouble(t(6)) + guardedDouble(t(7))) * 1000, 3)
          .as("total_processing_time_ms"),
        guardedLong(t(10)).as("received_bytes"),
        guardedLong(t(11)).as("sent_bytes"),
        ua.as("user_agent_full"),
        UaClassifier.browserFamily(ua).as("ua_browser_family"),
        UaClassifier.osFamily(ua).as("ua_os_family"),
        col("_src_file").as("log_source_file"))
  }
}
