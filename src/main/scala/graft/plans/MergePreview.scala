package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** MERGE-INTO preview — the SQL-frontend rung for upsert syntax.
  *
  * Spark's grammar parses `MERGE INTO` fine, but executing it needs a
  * catalog table with row-level-operation support; over temp views the
  * analyzer rejects the command. This engine's storage surface is
  * parquet + JDBC (reference: `etl_elb_log_to_mysql.py`'s append-only
  * MySQL sink), so instead of a writable catalog the extension rewrites
  * a resolved [[MergeIntoTable]] over plain relations into the
  * equivalent READ plan: the post-merge state as a result set (a "merge
  * preview" — the same SELECT a warehouse would run to validate a merge
  * before committing it, and exactly the shape the DuckDB oracle can
  * cross-check). Registered via `injectResolutionRule` — the analyzer
  * rung of the extension ladder (AsOfJoinStrategy = planner,
  * GraftSqlParser = parser, RewriteDotProduct = optimizer).
  *
  * Supported shape (anything else is left untouched, so Spark's own
  * error surfaces): at most ONE matched action — `UPDATE SET`
  * (optionally conditional) or `DELETE` (optionally conditional) — at
  * most ONE not-matched `INSERT (cols) VALUES (...)` (optionally
  * conditional), no not-matched-by-source actions, no star forms.
  *
  * Rewrite, in target-column space:
  * {{{
  *   updated  = Project(target LEFT OUTER JOIN tag(source) ON cond)
  *              -- per column: IF(matched AND updCond, assigned, old)
  *              -- DELETE instead filters matched-AND-cond rows out
  *   inserted = Project(source LEFT ANTI JOIN target ON cond
  *                      [WHERE insCond])   -- unassigned cols → NULL
  *   preview  = updated UNION ALL inserted
  * }}}
  * `tag(source)` appends a literal TRUE `__graft_matched` column; after
  * the outer join its NULL-ness is the match indicator (source columns
  * themselves may be legitimately NULL). Cardinality precondition, as
  * in every MERGE engine: the source side must match each target row at
  * most once — real MERGE throws on duplicate matches; by default the
  * preview would duplicate the target row (documented, spec-pinned).
  *
  * STRICT CARDINALITY (round 15, closing the r14 divergence): with
  * `spark.sql.graft.merge.strictCardinality=true` the survivor branch
  * validates the precondition at runtime the way Delta/Hive do — each
  * target row gets a `monotonically_increasing_id` row id before the
  * outer join, a window `count(*)` partitioned on that id counts its
  * join multiplicity (1 for unmatched AND once-matched rows, >1 iff
  * two source rows satisfied the ON clause), and an `assert_true`
  * filter raises GRAFT_MERGE_CARDINALITY before any duplicated row can
  * escape. Cost when enabled: one extra hash-partition pass over the
  * joined frame keyed on the unique row id (no sort — unbounded-frame
  * count only needs partitioning); the default path is unchanged.
  * Action conditions deliberately do NOT narrow the count — ANSI MERGE
  * fails on duplicate ON-clause matches regardless of WHEN clauses.
  *
  * Scale shape: one equi-join shuffle per branch on the merge keys
  * (AQE broadcasts a small source), map-side projections, a union —
  * no window, no global sort; exactly the plan a hand-written upsert
  * SELECT compiles to.
  */
object MergePreviewRule extends Rule[LogicalPlan] {

  private def resolvedActions(as: Seq[MergeAction]): Boolean =
    as.forall(a => a.condition.forall(_.resolved) && (a match {
      case u: UpdateAction => u.assignments.forall(_.resolved)
      case i: InsertAction => i.assignments.forall(_.resolved)
      case _: DeleteAction => true
      case _               => false
    }))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable
        if m.targetTable.resolved && m.sourceTable.resolved &&
          m.mergeCondition.resolved && !m.withSchemaEvolution &&
          m.notMatchedBySourceActions.isEmpty &&
          m.matchedActions.size <= 1 && m.notMatchedActions.size <= 1 &&
          resolvedActions(m.matchedActions) &&
          resolvedActions(m.notMatchedActions) &&
          supported(m) =>
      rewrite(m)
  }

  private def supported(m: MergeIntoTable): Boolean = {
    val matchedOk = m.matchedActions.forall {
      case _: UpdateAction | _: DeleteAction => true
      case _                                 => false
    }
    val notMatchedOk = m.notMatchedActions.forall {
      case _: InsertAction => true
      case _               => false
    }
    matchedOk && notMatchedOk
  }

  private def castTo(v: Expression, a: Attribute): Expression =
    if (v.dataType == a.dataType) v else Cast(v, a.dataType)

  /** When strict cardinality is on, wrap the survivor-branch join so a
    * target row matched by more than one source row raises instead of
    * duplicating (see object scaladoc). `rid` is the row-id alias that
    * was appended to the target before the join. */
  private def cardinalityGuard(joined: LogicalPlan, rid: Attribute): LogicalPlan = {
    val cnt = Alias(
      WindowExpression(
        AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(rid), Nil,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))),
      "__graft_mcnt")()
    val win = Window(Seq(cnt), Seq(rid), Nil, joined)
    // assert_true is NULL when the predicate holds, so IsNull keeps every
    // valid row; a multiplicity > 1 raises before the Filter can pass it
    Filter(IsNull(new AssertTrue(
      LessThanOrEqual(cnt.toAttribute, Literal(1L)),
      Literal("GRAFT_MERGE_CARDINALITY: a target row matched more than " +
        "one source row; MERGE requires the ON clause to match each " +
        "target row at most once"))), win)
  }

  private def rewrite(m: MergeIntoTable): LogicalPlan = {
    val strict = conf.getConfString(
      "spark.sql.graft.merge.strictCardinality", "false") == "true"
    val tgt = m.targetTable
    val src = m.sourceTable
    val tCols = tgt.output

    // ---- survivor branch: target rows, updated / deleted where matched
    val updatedBranch: LogicalPlan = m.matchedActions.headOption match {
      case None =>
        // no matched action: every target row survives unchanged
        Project(tCols, tgt)
      case Some(action) =>
        val tag = Alias(Literal(true), "__graft_matched")()
        val tagged = Project(src.output :+ tag, src)
        // Row-id caveat (r15 ADVICE): MonotonicallyIncreasingID is
        // deterministic only per (partitioning, row order) of the target
        // subplan. On a STAGE RETRY beneath a non-order-stable target
        // (e.g. a groupBy), a recomputed partition can re-number rows,
        // splitting/merging the guard's window partitions — the guard
        // could then miss a true duplicate or raise spuriously. The
        // alternative (keying the window on the merge-key columns) is
        // not generally available: the ON clause is an arbitrary
        // predicate, not a column list, so there is no canonical key to
        // extract. Accepted risk: the guard is a VALIDATION (ANSI
        // cardinality check), not a result transform — a retry-window
        // anomaly can only mis-fire the assertion, never corrupt
        // survivor rows, and local[n] (this engine's gate + bench
        // harness) has no shuffle-fetch retries.
        val ridAlias = Alias(MonotonicallyIncreasingID(), "__graft_rid")()
        val tgtPlan: LogicalPlan =
          if (strict) Project(tCols :+ ridAlias, tgt) else tgt
        val rawJoin =
          Join(tgtPlan, tagged, LeftOuter, Some(m.mergeCondition), JoinHint.NONE)
        val joined =
          if (strict) cardinalityGuard(rawJoin, ridAlias.toAttribute)
          else rawJoin
        val matched: Expression = action.condition
          .map(c => And(IsNotNull(tag.toAttribute), c))
          .getOrElse(IsNotNull(tag.toAttribute))
        action match {
          case u: UpdateAction =>
            val byId: Map[ExprId, Expression] = u.assignments.collect {
              case Assignment(k: AttributeReference, v) => k.exprId -> v
            }.toMap
            val cols = tCols.map { a =>
              byId.get(a.exprId) match {
                case Some(v) =>
                  Alias(If(matched, castTo(v, a), a), a.name)()
                case None => a
              }
            }
            Project(cols, joined)
          case _: DeleteAction =>
            Project(tCols, Filter(Not(Coalesce(Seq(matched, Literal(false)))),
              joined))
        }
    }

    // ---- insert branch: source rows with no target match
    m.notMatchedActions.headOption match {
      case None => updatedBranch
      case Some(i: InsertAction) =>
        val anti = Join(src, tgt, LeftAnti, Some(m.mergeCondition), JoinHint.NONE)
        val filtered = i.condition.map(Filter(_, anti)).getOrElse(anti)
        val byId: Map[ExprId, Expression] = i.assignments.collect {
          case Assignment(k: AttributeReference, v) => k.exprId -> v
        }.toMap
        val cols = tCols.map { a =>
          Alias(castTo(byId.getOrElse(a.exprId, Literal(null, a.dataType)), a),
            a.name)()
        }
        Union(updatedBranch, Project(cols, filtered))
      case Some(other) =>
        throw new IllegalStateException(s"unreachable: $other") // guarded above
    }
  }
}
