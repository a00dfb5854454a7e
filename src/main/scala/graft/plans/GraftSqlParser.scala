package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL-frontend extension: `QUALIFY` support by desugaring.
  *
  * Spark 4.1's grammar has no QUALIFY clause (DuckDB, Snowflake and
  * BigQuery all accept it, and it is the first idiom an analyst
  * reaches for to filter on a window function without nesting). This
  * parser wraps the session's default parser and, ONLY when the
  * default parser rejects a statement that contains a top-level
  * QUALIFY token, rewrites
  *
  * {{{ SELECT ... FROM ... QUALIFY <pred> [ORDER BY ...] [LIMIT ...] }}}
  *
  * into the standard window-subquery form
  *
  * {{{ SELECT * FROM ( SELECT ... FROM ... ) __qualify__
  *     WHERE <pred> [ORDER BY ...] [LIMIT ...] }}}
  *
  * and re-parses. Supported subset (documented, deliberately
  * conservative): one QUALIFY per statement at paren-depth 0 whose
  * predicate references WINDOW-FUNCTION ALIASES from the select list
  * (the subquery rewrite makes every select-list alias visible to the
  * predicate and the trailing ORDER BY/LIMIT). Inline window
  * expressions inside the predicate itself are out of scope — alias
  * them in the select list. Also out of scope (declined EXPLICITLY,
  * original error rethrown): statements with a top-level set operation
  * (UNION/INTERSECT/EXCEPT) or SORT BY / DISTRIBUTE BY / CLUSTER BY —
  * the wrap cannot know which query block a set-operand QUALIFY binds
  * to (Round13Spec pins the rethrow). Statements the default parser
  * accepts are NEVER touched, so the extension cannot change the
  * meaning of any existing SQL; statements that fail for unrelated
  * reasons rethrow the ORIGINAL error.
  *
  * The token scan is quote- and comment-aware (single/double quotes,
  * backticks, `--` line comments, bracketed comments) and only fires
  * at paren-depth 0, so a literal `'QUALIFY'` or a subquery using the
  * word as an identifier cannot trigger the rewrite.
  */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    parseWithQualify(sqlText, delegate.parsePlan)

  override def parseQuery(sqlText: String): LogicalPlan =
    parseWithQualify(sqlText, delegate.parseQuery)

  private def parseWithQualify(sql: String, f: String => LogicalPlan): LogicalPlan =
    try f(sql)
    catch {
      case original: ParseException =>
        GraftSqlParser.desugarQualify(sql) match {
          case Some(rewritten) =>
            try f(rewritten)
            catch { case _: ParseException => throw original }
          case None => throw original
        }
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** Offsets of depth-0, unquoted, whole-word occurrences of each
    * keyword in `keys` (upper-cased match), in text order. */
  private def topLevelKeywordOffsets(sql: String, keys: Seq[String]): Seq[(Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    val n = sql.length
    var i = 0
    var depth = 0
    while (i < n) {
      sql.charAt(i) match {
        case '\'' | '"' | '`' =>
          val q = sql.charAt(i); i += 1
          while (i < n && sql.charAt(i) != q) {
            if (sql.charAt(i) == '\\' && q != '`') i += 1
            i += 1
          }
          i += 1
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
          i += 2
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if depth == 0 && (c.isLetter || c == '_') =>
          val start = i
          while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
          val word = sql.substring(start, i).toUpperCase(java.util.Locale.ROOT)
          keys.find { k =>
            if (!k.contains(' ')) word == k
            else word == k.takeWhile(_ != ' ') && {
              // two-word keyword (ORDER BY): peek the next word
              var j = i
              while (j < n && sql.charAt(j).isWhitespace) j += 1
              val s2 = j
              while (j < n && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
              sql.substring(s2, j).toUpperCase(java.util.Locale.ROOT) == k.dropWhile(_ != ' ').trim
            }
          }.foreach(k => out += ((start, k)))
        case _ => i += 1
      }
    }
    out.toSeq
  }

  /** The QUALIFY → window-subquery rewrite, or None when the statement
    * has no top-level QUALIFY (→ the original parse error stands).
    *
    * EXPLICIT subset boundary (round-14, ADVICE r13): a statement with
    * a top-level set operation (UNION/INTERSECT/EXCEPT) or a
    * SORT BY / DISTRIBUTE BY / CLUSTER BY organization clause is
    * DECLINED outright. The predicate cut below runs to the first
    * ORDER BY/LIMIT only; under a set operation the naive wrap would
    * parse but bind the filter to the WRONG block (QUALIFY in a second
    * branch would become a filter over the whole union), so those
    * shapes must rethrow the original error rather than rely on the
    * re-parse happening to fail. Declining can only lose a desugar,
    * never change semantics. */
  def desugarQualify(sql: String): Option[String] = {
    val marks = topLevelKeywordOffsets(sql, Seq("QUALIFY", "ORDER BY", "LIMIT"))
    val qs = marks.collect { case (off, "QUALIFY") => off }
    if (qs.size != 1) return None
    if (topLevelKeywordOffsets(sql, Seq("UNION", "INTERSECT", "EXCEPT",
        "SORT BY", "DISTRIBUTE BY", "CLUSTER BY")).nonEmpty) return None
    val q = qs.head
    val predEnd = marks
      .collectFirst { case (off, k) if off > q && k != "QUALIFY" => off }
      .getOrElse(sql.length)
    val pre = sql.substring(0, q)
    val pred = sql.substring(q + "QUALIFY".length, predEnd).trim
    val post = sql.substring(predEnd)
    if (pred.isEmpty) return None
    Some(s"SELECT * FROM ( $pre ) __qualify__ WHERE $pred $post")
  }
}
