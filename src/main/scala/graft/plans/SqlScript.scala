package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-statement SQL SCRIPT execution (round 17) — the surface that
  * turns the writable session catalog (CTAS / INSERT INTO / MERGE
  * EXECUTE, rounds 16–17) into a usable SQL *pipeline*: one script
  * text, statements executed sequentially, the last statement's result
  * returned. `spark.sql` executes exactly one statement; a warehouse
  * user's unit of work is a script (dbt model, Airflow task, psql -f),
  * so this is the missing frontend rung on top of the per-statement
  * pieces.
  *
  * Splitting is quote- and comment-aware (single/double quotes,
  * backticks, `--` line and bracketed comments — the
  * [[GraftSqlParser]] scanning discipline) and fires only at
  * paren-depth 0, so a literal `';'`, a quoted identifier, or a
  * semicolon inside a comment can never split a statement.
  *
  * Statement routing: `MERGE INTO` statements EXECUTE — they publish
  * through [[graft.ops.Merge.executeInto]]'s write-audit-publish path
  * against the statement's own target table (parsed from the text),
  * because `s.sql(MERGE…)` alone yields the preview READ plan
  * ([[MergePreviewRule]]), and a script author writing MERGE means
  * commit, not preview. Every other statement goes through `s.sql`
  * unchanged (CTAS / INSERT / CREATE VIEW are eagerly executed
  * commands there; a trailing SELECT yields the returned frame).
  *
  * Scale: the script runner adds NO execution machinery — each
  * statement is the same distributed plan it would be standalone; the
  * driver only sequences them, exactly like any SQL client.
  */
object SqlScript {

  /** Split `script` on top-level semicolons; drops empty/comment-only
    * fragments. Quote/comment/paren handling mirrors
    * [[GraftSqlParser.desugarQualify]]'s scanner. */
  def split(script: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val n = script.length
    var i = 0
    var depth = 0
    var start = 0
    // a statement boundary leaves the PREVIOUS statement's trailing
    // line comment at the head of the next fragment — strip leading
    // comments/whitespace so each emitted statement starts at its own
    // first keyword (comments inside the statement are untouched)
    def ltrim(stmt: String): String = {
      var s = stmt.dropWhile(_.isWhitespace)
      var changed = true
      while (changed) {
        changed = false
        if (s.startsWith("--")) {
          s = s.dropWhile(_ != '\n').dropWhile(_.isWhitespace); changed = true
        } else if (s.startsWith("/*")) {
          val e = s.indexOf("*/")
          s = (if (e >= 0) s.substring(e + 2) else "").dropWhile(_.isWhitespace)
          changed = true
        }
      }
      s
    }
    def emit(end: Int): Unit = {
      val stmt = ltrim(script.substring(start, end)).trim
      if (stmt.nonEmpty) out += stmt
      start = end + 1
    }
    while (i < n) {
      script.charAt(i) match {
        case '\'' | '"' | '`' =>
          // both escape styles: backslash AND the SQL-standard doubled
          // quote ('it''s') — a doubled closer stays inside the string
          val q = script.charAt(i); i += 1
          var closed = false
          while (i < n && !closed) {
            if (script.charAt(i) == '\\' && q != '`') i += 2
            else if (script.charAt(i) == q) {
              if (i + 1 < n && script.charAt(i + 1) == q) i += 2
              else { closed = true; i += 1 }
            } else i += 1
          }
        case '-' if i + 1 < n && script.charAt(i + 1) == '-' =>
          while (i < n && script.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && script.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(script.charAt(i) == '*' && script.charAt(i + 1) == '/')) i += 1
          i += 2
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case ';' if depth == 0 => emit(i); i += 1
        case _ => i += 1
      }
    }
    if (start < n) emit(n)
    out.toSeq
  }

  /** `stmt` with `--` line and bracketed comments removed (quote-aware)
    * — used both to detect comment-only fragments and to classify the
    * statement's leading keywords. */
  private[graft] def stripComments(stmt: String): String = {
    val sb = new StringBuilder
    val n = stmt.length
    var i = 0
    while (i < n) {
      stmt.charAt(i) match {
        case q @ ('\'' | '"' | '`') =>
          val s0 = i; i += 1
          var closed = false
          while (i < n && !closed) {
            if (stmt.charAt(i) == '\\' && q != '`') i += 2
            else if (stmt.charAt(i) == q) {
              if (i + 1 < n && stmt.charAt(i + 1) == q) i += 2
              else { closed = true; i += 1 }
            } else i += 1
          }
          sb.append(stmt.substring(s0, math.min(i, n)))
        case '-' if i + 1 < n && stmt.charAt(i + 1) == '-' =>
          while (i < n && stmt.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && stmt.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(stmt.charAt(i) == '*' && stmt.charAt(i + 1) == '/')) i += 1
          i += 2
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** The target table of a `MERGE INTO <target> [AS] [alias] USING …`
    * statement, or None when the statement is not a MERGE. */
  private[graft] def mergeTarget(stmt: String): Option[String] = {
    val toks = stripComments(stmt).split("\\s+").filter(_.nonEmpty)
    if (toks.length >= 3 && toks(0).equalsIgnoreCase("MERGE") &&
        toks(1).equalsIgnoreCase("INTO"))
      Some(toks(2).stripSuffix(",")) // qualified names pass through whole
    else None
  }

  /** Execute every statement of `script` in order; returns the LAST
    * statement's result frame (a script conventionally ends with the
    * SELECT that reads back what the pipeline built). MERGE statements
    * execute (write-audit-publish into their own target); all others
    * run through `spark.sql`. */
  def run(s: SparkSession, script: String): DataFrame = {
    val stmts = split(script)
    require(stmts.nonEmpty, "SQL script contains no statements")
    var last: DataFrame = null
    for (stmt <- stmts) {
      last = mergeTarget(stmt) match {
        case Some(target) =>
          graft.ops.Merge.executeInto(s, stmt, target)
          s.table(target)
        case None => s.sql(stmt)
      }
    }
    last
  }
}
