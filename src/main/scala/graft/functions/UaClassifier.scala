package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent → browser/OS family classification (reference A12,
  * `/root/reference/etl_elb_log_to_mysql.py:109-112`, which delegates to the
  * python `user_agents` package).
  *
  * Spark-first design: instead of a row-at-a-time UDF we use a `when(...)`
  * ladder over substring predicates — pure Catalyst expressions, fully
  * whole-stage-codegen'd, and therefore distributable with zero serialization
  * overhead. The ladder is declared once as data ([[rules]]) and compiled to
  * BOTH a Spark `Column` and an equivalent ANSI-SQL `CASE` chain so the
  * DuckDB oracle applies byte-identical semantics.
  *
  * This intentionally covers the dominant families only (the reference's
  * library knows thousands of obscure agents); unknown agents map to "Other",
  * empty/"-" to "Unknown" — matching the reference's default handling at
  * `/root/reference/etl_elb_log_to_mysql.py:110-112`.
  */
object UaClassifier {

  /** (family, substrings that must ALL appear, substrings that must NOT appear).
    * First match wins — order matters throughout: bots precede browsers
    * (evergreen Googlebot carries "Chrome/"), Edge/Opera/Samsung/Yandex
    * precede Chrome (they all carry "Chrome/"), mobile variants precede
    * their desktop base family. */
  val browserRules: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("Googlebot", Seq("Googlebot"), Seq.empty),
    ("Bingbot", Seq("bingbot"), Seq.empty),
    ("AhrefsBot", Seq("AhrefsBot"), Seq.empty),
    ("DuckDuckBot", Seq("DuckDuckBot"), Seq.empty),
    ("YandexBot", Seq("YandexBot"), Seq.empty),
    ("Applebot", Seq("Applebot"), Seq.empty),          // carries Safari/ + Version/
    ("SemrushBot", Seq("SemrushBot"), Seq.empty),
    ("PetalBot", Seq("PetalBot"), Seq.empty),
    ("Facebook Crawler", Seq("facebookexternalhit"), Seq.empty),
    ("Slackbot", Seq("Slackbot"), Seq.empty),
    ("Edge", Seq("Edg"), Seq.empty),                   // also matches EdgiOS/EdgA
    ("Samsung Internet", Seq("SamsungBrowser/"), Seq.empty),
    ("Opera Mobile", Seq("OPR/", "Mobile"), Seq.empty),
    ("Opera", Seq("OPR/"), Seq.empty),
    ("UC Browser", Seq("UCBrowser/"), Seq.empty),
    ("Yandex Browser", Seq("YaBrowser/"), Seq.empty),
    ("Vivaldi", Seq("Vivaldi/"), Seq.empty),
    ("Whale", Seq("Whale/"), Seq.empty),
    ("QQ Browser", Seq("MQQBrowser/"), Seq.empty),
    ("Amazon Silk", Seq("Silk/"), Seq.empty),
    ("Electron", Seq("Electron/"), Seq.empty),
    ("HeadlessChrome", Seq("HeadlessChrome"), Seq.empty),
    ("PhantomJS", Seq("PhantomJS"), Seq.empty),
    ("Chromium", Seq("Chromium/"), Seq.empty),
    ("Chrome Mobile iOS", Seq("CriOS/"), Seq.empty),   // Chrome on iOS: no Chrome/ token
    ("Firefox iOS", Seq("FxiOS/"), Seq.empty),         // Firefox on iOS: no Firefox/ token
    ("Chrome Mobile", Seq("Chrome/", "Mobile"), Seq.empty),
    ("Chrome", Seq("Chrome/"), Seq.empty),
    ("Seamonkey", Seq("Seamonkey"), Seq.empty),
    ("Firefox Mobile", Seq("Firefox/", "Mobile"), Seq("Seamonkey")),
    ("Firefox", Seq("Firefox/"), Seq("Seamonkey")),
    ("Mobile Safari", Seq("Safari/", "Mobile"), Seq.empty),
    ("Safari", Seq("Safari/", "Version/"), Seq.empty),
    ("IE", Seq("Trident/"), Seq.empty),
    ("IE", Seq("MSIE"), Seq.empty),
    ("curl", Seq("curl/"), Seq.empty),
    ("Wget", Seq("Wget/"), Seq.empty),
    ("Python Requests", Seq("python-requests"), Seq.empty),
    ("Go HTTP Client", Seq("Go-http-client"), Seq.empty),
    ("OkHttp", Seq("okhttp"), Seq.empty),
    ("Apache HttpClient", Seq("Apache-HttpClient"), Seq.empty),
  )

  val osRules: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("Windows Phone", Seq("Windows Phone"), Seq.empty),
    ("Windows", Seq("Windows NT"), Seq.empty),
    ("iOS", Seq("iPhone"), Seq.empty),
    ("iOS", Seq("iPad"), Seq.empty),
    ("iOS", Seq("iPod"), Seq.empty),
    ("Mac OS X", Seq("Mac OS X"), Seq.empty),
    ("Chrome OS", Seq("CrOS"), Seq.empty),
    ("BlackBerry", Seq("BB10"), Seq.empty),
    ("BlackBerry", Seq("BlackBerry"), Seq.empty),
    ("KaiOS", Seq("KAIOS/"), Seq.empty),
    ("Symbian", Seq("SymbianOS"), Seq.empty),
    ("Android", Seq("Android"), Seq.empty),
    ("Tizen", Seq("Tizen"), Seq.empty),                // before Linux: smart-TV UAs carry both
    ("webOS", Seq("Web0S"), Seq.empty),                // LG spells it with a zero
    ("webOS", Seq("webOS"), Seq.empty),
    ("Ubuntu", Seq("Ubuntu"), Seq.empty),
    ("FreeBSD", Seq("FreeBSD"), Seq.empty),
    ("OpenBSD", Seq("OpenBSD"), Seq.empty),
    ("NetBSD", Seq("NetBSD"), Seq.empty),
    ("Linux", Seq("Linux"), Seq.empty),
  )

  private def isBlank(ua: Column): Column = ua.isNull || ua === "" || ua === "-"

  private def ladder(ua: Column, rules: Seq[(String, Seq[String], Seq[String])],
                     fallback: String): Column = {
    val tail: Column = rules.reverse.foldLeft(lit(fallback)) {
      case (els, (family, pos, neg)) =>
        val cond = (pos.map(p => ua.contains(p)) ++ neg.map(n => !ua.contains(n)))
          .reduce(_ && _)
        when(cond, lit(family)).otherwise(els)
    }
    when(isBlank(ua), lit("Unknown")).otherwise(tail)
  }

  /** Browser family as a codegen'd Column expression. */
  def browserFamily(ua: Column): Column = ladder(ua, browserRules, "Other")

  /** OS family as a codegen'd Column expression. */
  def osFamily(ua: Column): Column = ladder(ua, osRules, "Other")

  // ---- SQL twin (DuckDB oracle) ------------------------------------------

  private def sqlLadder(uaExpr: String,
                        rules: Seq[(String, Seq[String], Seq[String])],
                        fallback: String): String = {
    val whens = rules.map { case (family, pos, neg) =>
      val conds = pos.map(p => s"contains($uaExpr, '$p')") ++
        neg.map(n => s"NOT contains($uaExpr, '$n')")
      s"WHEN ${conds.mkString(" AND ")} THEN '$family'"
    }
    s"""CASE WHEN $uaExpr IS NULL OR $uaExpr = '' OR $uaExpr = '-' THEN 'Unknown'
       |${whens.mkString(" ")} ELSE '$fallback' END""".stripMargin.replace("\n", " ")
  }

  def browserFamilySql(uaExpr: String): String = sqlLadder(uaExpr, browserRules, "Other")
  def osFamilySql(uaExpr: String): String = sqlLadder(uaExpr, osRules, "Other")
}
