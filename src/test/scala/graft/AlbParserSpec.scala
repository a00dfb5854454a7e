package graft

import org.apache.spark.sql.functions._

import graft.etl.AlbLogParser

/** Golden parser tests — revives the reference's commented-out suite
  * (`/root/reference/tests/test_utils.py:14-44`) plus the edge lines from
  * FIXTURES.md §1. */
class AlbParserSpec extends SparkSpec {
  import spark.implicits._

  /** The reference's golden 29-field sample line (tests/test_utils.py:15-23). */
  val golden =
    """h2 2025-05-26T23:55:02.179979Z app/erank-app/xxxxxxx 1.2.3.4:5678 5.6.7.8:80 0.001 0.303 0.000 200 200 74 1013 "POST https://example.com:443/api/browser-ext-user HTTP/2.0" "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/137.0.0.0 Safari/537.36" TLS_AES_128_GCM_SHA256 TLSv1.3 arn:aws:elasticloadbalancing:region:accountid:targetgroup/example-app-v3-production/xxxxxxxx "Root=1-xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx" "example.com" "session-reused" 1 2025-05-26T23:55:01.875000Z "waf,forward" "-" "-" "5.6.7.8:80" "200" "-" "-" TID_xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"""

  def parse(lines: String*): Array[org.apache.spark.sql.Row] =
    AlbLogParser.parse(lines.toDF("value"), "value", lit("test"))
      .orderBy("log_timestamp").collect()

  test("golden line parses with reference-exact values") {
    val rows = parse(golden)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("client_ip") == "1.2.3.4")
    assert(r.getAs[String]("http_method") == "POST")
    assert(r.getAs[String]("requested_path") == "/api/browser-ext-user")
    assert(r.getAs[Int]("elb_status_code") == 200)
    assert(r.getAs[Int]("backend_status_code") == 200)
    assert(r.getAs[Double]("total_processing_time_ms") == 304.0)
    assert(r.getAs[Long]("received_bytes") == 74L)
    assert(r.getAs[Long]("sent_bytes") == 1013L)
    assert(r.getAs[String]("user_agent_full").startsWith("Mozilla/"))
    assert(r.getAs[String]("ua_browser_family") == "Chrome")
    assert(r.getAs[String]("ua_os_family") == "Windows")
    assert(r.getAs[String]("log_source_file") == "test")
    // 2025-05-26T23:55:02.179979Z UTC → Eastern (EDT, -4h)
    val ts = java.time.LocalDateTime.ofInstant(
      r.getAs[java.sql.Timestamp]("log_timestamp").toInstant,
      java.time.ZoneOffset.UTC)
    assert(ts.toString == "2025-05-26T19:55:02.179979")
  }

  test("short and bad-timestamp lines are dropped (reference :67-69,81-83)") {
    assert(parse("too short").isEmpty)
    assert(parse(golden.replace("2025-05-26T23:55:02.179979Z", "not-a-ts")).isEmpty)
    assert(parse("too short", golden).length == 1)
  }

  test("no-fraction timestamp parses via second format (reference :41)") {
    val rows = parse(golden.replace("2025-05-26T23:55:02.179979Z", "2025-05-26T23:55:02Z"))
    assert(rows.length == 1)
  }

  test("'-' statuses and user agent map to sentinels (reference :43-50,110-112)") {
    val line = golden
      .replace(" 200 200 ", " - 999 ")
      .replace("\"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/137.0.0.0 Safari/537.36\"", "\"-\"")
    val r = parse(line).head
    assert(r.getAs[Int]("elb_status_code") == 0)
    assert(r.getAs[Int]("backend_status_code") == 999)
    assert(r.getAs[String]("ua_browser_family") == "Unknown")
    assert(r.getAs[String]("ua_os_family") == "Unknown")
  }

  test("-1 processing times flow into the ms sum (reference to_float :46-50)") {
    val r = parse(golden.replace(" 0.001 0.303 0.000 ", " -1 0.303 -1 ")).head
    assert(r.getAs[Double]("total_processing_time_ms") == -1697.0)
  }

  test("IPv6-hostile client_ip split keeps prefix before first colon (reference :86)") {
    val r = parse(golden.replace("1.2.3.4:5678", "2001:db8::1.5678")).head
    assert(r.getAs[String]("client_ip") == "2001")
  }

  test("request field '- - -' yields '-' method and '-' path (urlparse parity)") {
    val r = parse(golden.replace(
      "\"POST https://example.com:443/api/browser-ext-user HTTP/2.0\"", "\"- - -\"")).head
    assert(r.getAs[String]("http_method") == "-")
    assert(r.getAs[String]("requested_path") == "-")
  }

  test("UA ladder classifies each major family (A12)") {
    import graft.etl.AlbFixture
    val expected = AlbFixture.userAgents
      .zip(AlbFixture.expectedBrowser.zip(AlbFixture.expectedOs)) ++ Seq(
      ("Mozilla/5.0 (Windows NT 10.0) Gecko Firefox/115.0", ("Firefox", "Windows")),
      ("Mozilla/5.0 (Linux; Android 14; Pixel) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/125.0.0.0 Mobile Safari/537.36", ("Chrome Mobile", "Android")),
      ("Opera/OPR/99 something", ("Opera", "Other")),
      ("python-requests/2.31.0", ("Python Requests", "Other")),
      ("Googlebot/2.1 (+http://www.google.com/bot.html)", ("Googlebot", "Other")),
      ("Mozilla/5.0 (Macintosh; Intel Mac OS X 14_5) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.5 Safari/605.1.15", ("Safari", "Mac OS X")),
      ("Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:126.0) Gecko Firefox/126.0", ("Firefox", "Ubuntu")),
      ("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)", ("Bingbot", "Other")),
      ("Mozilla/5.0 (compatible; AhrefsBot/7.0; +http://ahrefs.com/robot/)", ("AhrefsBot", "Other")),
      ("Mozilla/5.0 (Linux; U; Android 10; en-US; SM-A205G) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 UCBrowser/13.7.8.1320 Mobile Safari/537.36", ("UC Browser", "Android")),
      ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/122.0.0.0 YaBrowser/24.4.0.0 Safari/537.36", ("Yandex Browser", "Windows")),
      ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) HeadlessChrome/118.0.0.0 Safari/537.36", ("HeadlessChrome", "Linux")),
      ("Mozilla/5.0 (Android 14; Mobile; rv:126.0) Gecko/126.0 Firefox/126.0", ("Firefox Mobile", "Android")),
      ("Wget/1.21.3", ("Wget", "Other")),
      ("Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 6.1)", ("IE", "Windows")),
      ("Mozilla/5.0 (iPod touch; CPU iPhone OS 15_8 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/15.6 Mobile/15E148 Safari/604.1", ("Mobile Safari", "iOS")),
      ("Mozilla/5.0 (compatible; DuckDuckBot-Https/1.1; https://duckduckgo.com/duckduckbot)", ("DuckDuckBot", "Other")),
      ("Mozilla/5.0 (compatible; YandexBot/3.0; +http://yandex.com/bots)", ("YandexBot", "Other")),
      ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.4 Safari/605.1.15 (Applebot/0.1; +http://www.apple.com/go/applebot)", ("Applebot", "Mac OS X")),
      ("Mozilla/5.0 (compatible; SemrushBot/7~bl; +http://www.semrush.com/bot.html)", ("SemrushBot", "Other")),
      ("Mozilla/5.0 (Linux; Android 7.0;) AppleWebKit/537.36 (KHTML, like Gecko) Mobile Safari/537.36 (compatible; PetalBot;+https://webmaster.petalsearch.com/site/petalbot)", ("PetalBot", "Android")),
      ("facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)", ("Facebook Crawler", "Other")),
      ("Slackbot-LinkExpanding 1.0 (+https://api.slack.com/robots)", ("Slackbot", "Other")),
      ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36 Vivaldi/6.7", ("Vivaldi", "Windows")),
      ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/122.0.0.0 Whale/3.25.232.19 Safari/537.36", ("Whale", "Windows")),
      ("Mozilla/5.0 (Linux; U; Android 13; zh-cn; 2211133C) AppleWebKit/533.1 (KHTML, like Gecko) Version/4.0 Chrome/90.0.4430.210 MQQBrowser/13.6 Mobile Safari/537.36", ("QQ Browser Mobile", "Android")),
      ("Mozilla/5.0 (Linux; Android 9; KFMAWI) AppleWebKit/537.36 (KHTML, like Gecko) Silk/126.2.5 like Chrome/126.0.6478.71 Safari/537.36", ("Amazon Silk", "Android")),
      ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) my-app/2.1.0 Chrome/120.0.6099.291 Electron/28.2.6 Safari/537.36", ("Electron", "Windows")),
      ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/534.34 (KHTML, like Gecko) PhantomJS/2.1.1 Safari/534.34", ("PhantomJS", "Linux")),
      ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chromium/124.0.6367.60 Chrome/124.0.6367.60 Safari/537.36", ("Chromium", "Linux")),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_4_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/124.0.6367.111 Mobile/15E148 Safari/604.1", ("Chrome Mobile iOS", "iOS")),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_4 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/125.1 Mobile/15E148 Safari/605.1.15", ("Firefox iOS", "iOS")),
      ("Mozilla/5.0 (X11; Linux x86_64; rv:52.0) Gecko/20100101 Firefox/52.0 Seamonkey/2.49.1", ("Seamonkey", "Linux")),
      ("Go-http-client/2.0", ("Go HTTP Client", "Other")),
      ("okhttp/4.12.0", ("OkHttp", "Other")),
      ("Apache-HttpClient/4.5.14 (Java/17.0.10)", ("Apache HttpClient", "Other")),
      ("Mozilla/5.0 (BB10; Touch) AppleWebKit/537.35+ (KHTML, like Gecko) Version/10.3.3.3216 Mobile Safari/537.35+", ("Mobile Safari", "BlackBerry")),
      ("Mozilla/5.0 (Mobile; LYF/F300B/LYF-F300B-001-02-15-130119; Android; rv:48.0) Gecko/48.0 Firefox/48.0 KAIOS/2.5", ("Firefox Mobile", "KaiOS")),
      ("Mozilla/5.0 (SMART-TV; LINUX; Tizen 6.5) AppleWebKit/537.36 (KHTML, like Gecko) Version/6.5 TV Safari/537.36", ("Safari", "Tizen")),
      ("Mozilla/5.0 (Web0S; Linux/SmartTV) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/87.0.4280.88 Safari/537.36 WebAppManager", ("Chrome", "webOS")),
      ("Mozilla/5.0 (X11; FreeBSD amd64; rv:126.0) Gecko/20100101 Firefox/126.0", ("Firefox", "FreeBSD")),
      ("Mozilla/5.0 (SymbianOS/9.4; Series60/5.0 NokiaN97-1/20.0.019) AppleWebKit/525 (KHTML, like Gecko) BrowserNG/7.1.4", ("Nokia Browser", "Symbian")),
      ("some-novel-agent/1.0", ("Other", "Other")))
    val df = expected.map(_._1).toDF("ua")
    val got = df.select(
      graft.functions.UaClassifier.browserFamily(col("ua")),
      graft.functions.UaClassifier.osFamily(col("ua"))).collect()
    got.zip(expected).foreach { case (r, (ua, (brow, os))) =>
      assert(r.getString(0) == brow && r.getString(1) == os, s"ua '$ua'")
    }
  }

  test("every UA rule's Column compilation matches the rule-data interpreter") {
    import graft.functions.UaClassifier
    // For each rule, synthesize an agent from its positive tokens; the
    // EXPECTED family is whatever the plain-Scala interpreter of the same
    // rule list assigns (an earlier rule may legitimately win). This pins
    // the when-ladder compilation rule-for-rule across all ~250 rules —
    // any ordering or token drift between the data and the Column shows
    // up as a mismatch.
    val cases =
      UaClassifier.browserRules.map { case (_, pos, _) =>
        val ua = s"Mozilla/5.0 ${pos.mkString(" ")} synthetic"
        (ua, UaClassifier.interpret(ua, UaClassifier.browserRules, "Other"), true)
      } ++ UaClassifier.osRules.map { case (_, pos, _) =>
        val ua = s"Mozilla/5.0 (${pos.mkString("; ")}) synthetic"
        (ua, UaClassifier.interpret(ua, UaClassifier.osRules, "Other"), false)
      }
    val df = cases.map(_._1).toDF("ua").select(col("ua"),
      UaClassifier.browserFamily(col("ua")).as("b"),
      UaClassifier.osFamily(col("ua")).as("o"))
    df.collect().zip(cases).foreach { case (r, (ua, want, isBrowser)) =>
      val got = if (isBrowser) r.getString(1) else r.getString(2)
      assert(got == want, s"ua '$ua': got $got want $want")
    }
  }

  test("browser major versions match the hand-read fixture goldens") {
    import graft.etl.AlbFixture
    import graft.functions.UaClassifier
    // expectedBrowserMajor is human-read from the agent strings, so this
    // pins the version regex table against ground truth rather than
    // against its own output.
    val df = AlbFixture.userAgents.zip(AlbFixture.expectedBrowser)
      .toDF("ua", "family")
      .select(col("ua"),
        UaClassifier.browserMajor(col("ua"), col("family")).as("major"))
    df.collect().map(_.getString(1)).zip(AlbFixture.expectedBrowserMajor)
      .zip(AlbFixture.userAgents).foreach { case ((got, want), ua) =>
        assert(got == want, s"ua '$ua': got major '$got' want '$want'")
      }
  }

  test("OS versions match the hand-read fixture goldens") {
    import graft.etl.AlbFixture
    import graft.functions.UaClassifier
    // expectedOsVersion is human-read from the agent strings (incl. the
    // NT→marketing map and Apple underscore normalization), so this pins
    // the OS version table against ground truth, not its own output.
    val df = AlbFixture.userAgents.zip(AlbFixture.expectedOs)
      .toDF("ua", "family")
      .select(col("ua"),
        UaClassifier.osVersion(col("ua"), col("family")).as("v"))
    df.collect().map(_.getString(1)).zip(AlbFixture.expectedOsVersion)
      .zip(AlbFixture.userAgents).foreach { case ((got, want), ua) =>
        assert(got == want, s"ua '$ua': got os version '$got' want '$want'")
      }
  }

  test("UaFamilyExpr loop runtime matches the when-ladder compilation") {
    import graft.functions.UaClassifier
    // browserFamily/osFamily now compile to the UaRuntime rule-table loop;
    // this pins it against the original Column when-ladder of the same
    // rule data over every rule's synthetic agent plus the blank/edge
    // sentinels, closing the chain: interpret == ladder == loop == SQL.
    val agents =
      UaClassifier.browserRules.map { case (_, pos, _) =>
        s"Mozilla/5.0 ${pos.mkString(" ")} synthetic"
      } ++ UaClassifier.osRules.map { case (_, pos, _) =>
        s"Mozilla/5.0 (${pos.mkString("; ")}) synthetic"
      } ++ Seq("", "-", "some-novel-agent/1.0", null)
    val df = agents.toDF("ua").select(col("ua"),
      UaClassifier.browserFamily(col("ua")).as("b_loop"),
      UaClassifier.browserFamilyLadder(col("ua")).as("b_ladder"),
      UaClassifier.osFamily(col("ua")).as("o_loop"),
      UaClassifier.osFamilyLadder(col("ua")).as("o_ladder"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"browser mismatch for '${r.getString(0)}': loop=${r.getString(1)} ladder=${r.getString(2)}")
      assert(r.getString(3) == r.getString(4),
        s"os mismatch for '${r.getString(0)}': loop=${r.getString(3)} ladder=${r.getString(4)}")
    }
    // version expression vs its when-chain twin, over UAs that exercise
    // every version rule (the synthetic agents carry no version tokens,
    // so add real-shaped ones per rule)
    val versioned = UaClassifier.versionRules.map { case (fam, _) =>
      (s"Mozilla/5.0 Chrome/101 CriOS/102 Chromium/103 HeadlessChrome/104 " +
        "Edg/105 Firefox/106 Fennec/107 FxiOS/108 Version/109 OPR/110 " +
        "Opera Mini/111 SamsungBrowser/112 UCBrowser/113 MQQBrowser/114 " +
        "QQBrowser/115 YaBrowser/116 Vivaldi/117 Whale/118 Brave/119 " +
        "Silk/120 MicroMessenger/121 rv:122 IEMobile/123 curl/124 " +
        "Wget/125 Googlebot/126 bingbot/127 Opera/128", fam)
    } ++ Seq(("no tokens at all", "Chrome"), ("", "Unknown"), (null, "Other"))
    val vdf = versioned.toDF("ua", "fam").select(
      UaClassifier.browserMajor(col("ua"), col("fam")).as("expr"),
      UaClassifier.browserMajorLadder(col("ua"), col("fam")).as("ladder"))
    vdf.collect().zip(versioned).foreach { case (r, (ua, fam)) =>
      assert(r.getString(0) == Option(r.getString(1)).getOrElse(""),
        s"version mismatch for fam=$fam: expr=${r.getString(0)} ladder=${r.getString(1)}")
    }
  }

  test("automaton matches the interpreter on 500 random token-soup agents") {
    import graft.functions.UaClassifier
    // Fuzz pin for the Aho-Corasick runtime: agents assembled from
    // random rule tokens (including substrings that overlap across
    // tokens), random separators, and noise — regimes the per-rule
    // goldens don't reach, e.g. tokens arriving via CONCATENATION of
    // other tokens or split across hostile contexts. The plain-Scala
    // interpreter (naive contains) is the semantics oracle. Seeded —
    // failures reproduce.
    val rnd = new scala.util.Random(7)
    val allTokens = (UaClassifier.browserRules ++ UaClassifier.osRules)
      .flatMap(r => r._2 ++ r._3).distinct.toIndexedSeq
    val noise = IndexedSeq("Mozilla/5.0", "(KHTML,", "like", "Gecko)", "x64;",
      "rv:1.0", ";", "compatible;", "+http://x.y/bot.html", "Æ™é")
    val agents = (1 to 500).map { _ =>
      val parts = (0 until rnd.nextInt(8)).map { _ =>
        if (rnd.nextBoolean()) allTokens(rnd.nextInt(allTokens.size))
        else noise(rnd.nextInt(noise.size))
      }
      val sep = if (rnd.nextBoolean()) " " else ""
      parts.mkString(sep)
    } ++ Seq("", "-")
    val df = agents.toDF("ua").select(col("ua"),
      graft.functions.UaClassifier.browserFamily(col("ua")).as("b"),
      graft.functions.UaClassifier.osFamily(col("ua")).as("o"))
    df.collect().zip(agents).foreach { case (r, ua) =>
      val wantB = UaClassifier.interpret(ua, UaClassifier.browserRules, "Other")
      val wantO = UaClassifier.interpret(ua, UaClassifier.osRules, "Other")
      assert(r.getString(1) == wantB,
        s"browser fuzz mismatch for '$ua': got ${r.getString(1)} want $wantB")
      assert(r.getString(2) == wantO,
        s"os fuzz mismatch for '$ua': got ${r.getString(2)} want $wantO")
    }
  }

  test("crawler guard is a sound cover: every crawler rule trips it") {
    import graft.functions.UaClassifier
    // Soundness of the fast-path skip: any UA matching crawler rule R
    // contains all of R's positive tokens, so if some positive token
    // CONTAINS a guard substring the guard must fire for that UA. One
    // such token per rule proves the guard never suppresses a crawler
    // classification. (A guard false-positive merely walks the full
    // ladder — covered by the rule-for-rule golden test above.)
    UaClassifier.crawlerRules.foreach { case (family, pos, _) =>
      assert(UaClassifier.crawlerGuardTokens.exists(g => pos.exists(_.contains(g))),
        s"crawler rule '$family' ($pos) has no token containing a guard substring")
    }
  }

  test("backslash-escaped quote inside a quoted field parses (SURVEY §7.3 risk)") {
    // csv escape='\\': embedded \" stays inside the UA token
    val line = golden.replace(
      "\"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/137.0.0.0 Safari/537.36\"",
      "\"weird \\\"agent\\\" v1 Chrome/1.0\"")
    val r = parse(line).head
    assert(r.getAs[String]("user_agent_full") == "weird \"agent\" v1 Chrome/1.0")
    assert(r.getAs[String]("ua_browser_family") == "Chrome")
  }

  test("reads gzip'd log files from disk with per-file provenance (A1-A3)") {
    val dir = java.nio.file.Files.createTempDirectory("alblogs")
    def writeGz(name: String, lines: Seq[String]): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(dir.resolve(name).toFile))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    }
    writeGz("a.log.gz", Seq(golden, "too short"))
    writeGz("b.log.gz", Seq(golden.replace("1.2.3.4", "9.9.9.9")))
    java.nio.file.Files.writeString(dir.resolve("ignored.txt"), golden)

    val parsed = AlbLogParser.parse(AlbLogParser.readLogs(spark, dir.toString))
    val rows = parsed.orderBy("client_ip").collect()
    assert(rows.length == 2)  // 2 valid lines; .txt excluded by glob, short line dropped
    assert(rows.head.getAs[String]("client_ip") == "1.2.3.4")
    assert(rows.head.getAs[String]("log_source_file").endsWith("a.log.gz"))
    assert(rows.last.getAs[String]("log_source_file").endsWith("b.log.gz"))
  }

  test("corrupt gz files are skipped, not fatal (reference :137,146-147)") {
    val dir = java.nio.file.Files.createTempDirectory("albcorrupt")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(dir.resolve("good.log.gz").toFile))
    out.write(golden.getBytes("UTF-8")); out.close()
    // truncated gzip: valid header, torn-off body
    val full = java.nio.file.Files.readAllBytes(dir.resolve("good.log.gz"))
    java.nio.file.Files.write(dir.resolve("bad.log.gz"), full.take(full.length / 2))

    val parsed = AlbLogParser.parse(AlbLogParser.readLogs(spark, dir.toString))
    val ok = parsed.collect()
    assert(ok.length == 1 && ok.head.getAs[String]("log_source_file").endsWith("good.log.gz"))
  }

  test("observe() metrics expose input/kept row counts (A20)") {
    val lines = Seq(golden, "too short", golden.replace("2025-05-26T23:55:02.179979Z", "bad"))
      .toDF("value")
    val (parsed, inObs, outObs) = AlbLogParser.parseObserved(lines, "value", lit("test"))
    parsed.collect()
    assert(inObs.get("rows_in") == 3L)
    assert(outObs.get("rows_out") == 1L)
  }

  test("guarded casts: digits-only ints, permissive floats (tests/test_utils.py:4-12)") {
    val df = Seq("123", "-1", "-", "", "1.5", "1e3", "abc").toDF("v")
    val got = df.select(
      AlbLogParser.guardedInt(col("v")).as("i"),
      AlbLogParser.guardedDouble(col("v")).as("f")).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(123, 0, 0, 0, 0, 0, 0))
    assert(got.map(_.getDouble(1)).toSeq == Seq(123.0, -1.0, 0.0, 0.0, 1.5, 1000.0, 0.0))
  }
}
