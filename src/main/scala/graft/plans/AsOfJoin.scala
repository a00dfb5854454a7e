package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for every left row, attach the single right row
  * with equal keys and — backward (`forward=false`) — the greatest
  * `rightTime <= leftTime`, or — forward — the smallest
  * `rightTime >= leftTime` (left-outer — unmatched left rows keep nulls
  * on the right).
  *
  * This is the whole-operator tier of the extension ladder (SURVEY.md
  * §4.2c): Spark has no native as-of join (the usual emulations are a
  * union + `last(ignoreNulls) over rows-between` window — see
  * q_join_asof — or a range join + rank filter, both of which
  * materialize/scan more than one row per match). The node is planned by
  * [[AsOfJoinStrategy]] into [[AsOfJoinExec]], a co-partitioned
  * single-pass merge.
  *
  * Resolution contract: children are ALREADY-ANALYZED plans and the
  * key/time expressions are resolved attributes of those plans (the
  * [[graft.ops.Joins.asofBackward]] builder guarantees both, and
  * re-aliases the right side so a self-join cannot alias-collide), so the
  * node passes analysis untouched.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false)
  extends BinaryNode {

  // Fail construction, not execution: the merge compares key/time values
  // with orderings built from the LEFT side's types, so a type mismatch
  // (INT vs BIGINT, TIMESTAMP vs TIMESTAMP_NTZ) would silently misread
  // UnsafeRow bytes instead of erroring. Cast upstream to align.
  require(leftKeys.size == rightKeys.size,
    s"as-of join: ${leftKeys.size} left keys vs ${rightKeys.size} right keys")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of join: key type mismatch ${l.dataType} vs ${r.dataType} " +
        s"($l vs $r) — cast one side to align")
  }
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join: time type mismatch ${leftTime.dataType} vs " +
      s"${rightTime.dataType} — cast one side to align")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}
