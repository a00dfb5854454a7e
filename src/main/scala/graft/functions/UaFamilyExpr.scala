package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Data-driven runtime for the UA rule tables: the SAME ordered rules as
  * [[UaClassifier]] (single source of truth — compiled from its Seqs at
  * object init, once per JVM), walked by a tight loop over precompiled
  * `UTF8String` token arrays instead of an unrolled when-ladder.
  *
  * Why this exists: compiling ~250 rules × 1-2 `contains` each into
  * whole-stage codegen produces tens of kilobytes of branchy bytecode per
  * ladder — HotSpot warms it slowly (and can refuse huge methods
  * outright), so the first executions of q_parse_alb paid ~0.6s/run of
  * interpretation overhead that never showed up in long-lived sessions.
  * A 30-line loop over static arrays JIT-compiles in the first few
  * thousand rows, costs the same `UTF8String.contains` calls at steady
  * state, and keeps the generated projection method tiny so the REST of
  * the parse stays inlinable. Matching semantics are byte-identical:
  * `UTF8String.contains` is exactly what the `Column.contains` ladder
  * compiled to.
  */
object UaRuntime {
  private def compileRules(rules: Seq[(String, Seq[String], Seq[String])])
      : (Array[UTF8String], Array[Array[UTF8String]], Array[Array[UTF8String]]) =
    (rules.map(r => UTF8String.fromString(r._1)).toArray,
      rules.map(_._2.map(UTF8String.fromString).toArray).toArray,
      rules.map(_._3.map(UTF8String.fromString).toArray).toArray)

  private val (crawlFam, crawlPos, crawlNeg) = compileRules(UaClassifier.crawlerRules)
  private val (browFam, browPos, browNeg) = compileRules(UaClassifier.browserOnlyRules)
  private val (osFam, osPos, osNeg) = compileRules(UaClassifier.osRules)
  private val guard: Array[UTF8String] =
    UaClassifier.crawlerGuardTokens.map(UTF8String.fromString).toArray

  private val UNKNOWN = UTF8String.fromString("Unknown")
  private val OTHER = UTF8String.fromString("Other")
  private val DASH = UTF8String.fromString("-")

  private def isBlank(ua: UTF8String): Boolean =
    ua == null || ua.numBytes == 0 || ua.equals(DASH)

  /** First rule whose positive tokens all occur and negative tokens all
    * don't; null when nothing matches (the ladder's null fallback). */
  private def walk(ua: UTF8String, fam: Array[UTF8String],
                   pos: Array[Array[UTF8String]],
                   neg: Array[Array[UTF8String]]): UTF8String = {
    var i = 0
    while (i < fam.length) {
      val ps = pos(i)
      var ok = true
      var j = 0
      while (ok && j < ps.length) { ok = ua.contains(ps(j)); j += 1 }
      val ns = neg(i)
      j = 0
      while (ok && j < ns.length) { ok = !ua.contains(ns(j)); j += 1 }
      if (ok) return fam(i)
      i += 1
    }
    null
  }

  /** Mirrors [[UaClassifier.browserFamily]]'s guarded-coalesce shape:
    * blank → Unknown; guard hit → crawler rules (a miss falls through);
    * then the browser rules; then Other. */
  def browser(ua: UTF8String): UTF8String = {
    if (isBlank(ua)) return UNKNOWN
    var g = false
    var i = 0
    while (!g && i < guard.length) { g = ua.contains(guard(i)); i += 1 }
    if (g) {
      val m = walk(ua, crawlFam, crawlPos, crawlNeg)
      if (m != null) return m
    }
    val m = walk(ua, browFam, browPos, browNeg)
    if (m != null) m else OTHER
  }

  def os(ua: UTF8String): UTF8String = {
    if (isBlank(ua)) return UNKNOWN
    val m = walk(ua, osFam, osPos, osNeg)
    if (m != null) m else OTHER
  }
}

/** UA-family classification as a native Catalyst expression: generated
  * code is ONE static call into [[UaRuntime]], not an unrolled ladder.
  * Never null (null/blank input classifies as "Unknown", same as the
  * reference's sentinel at `etl_elb_log_to_mysql.py:110-112`). */
case class UaFamilyExpr(child: Expression, isOs: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = if (isOs) "ua_os_family" else "ua_browser_family"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string user-agent column, got $dt")
  }

  override def eval(input: InternalRow): Any = {
    val ua = child.eval(input).asInstanceOf[UTF8String]
    if (isOs) UaRuntime.os(ua) else UaRuntime.browser(ua)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val fn = if (isOs) "os" else "browser"
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} =
          graft.functions.UaRuntime.$fn(${c.isNull} ? null : ${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): UaFamilyExpr =
    copy(child = newChild)
}
