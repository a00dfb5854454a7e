package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical backward as-of join: a single forward merge over two inputs
  * that the planner has co-partitioned by key ([[ClusteredDistribution]]
  * on both children, exactly like SortMergeJoin) and sorted by
  * (keys, time). Per partition the right iterator advances monotonically
  * — each right row is visited ONCE regardless of how many left rows it
  * matches — and the only per-key state is one buffered right row (the
  * current best match). O(|L|+|R|) per partition, O(1) memory, no
  * window buffering, no per-match re-scan; 100 TB-safe because the only
  * shuffle is the key co-partitioning both sides need anyway.
  *
  * Tie semantics: among right rows with equal time the LAST in the
  * (keys, time) sort order wins; callers wanting determinism must make
  * (keys, time) unique on the right (the graft query dedups to one row
  * per key+time). Null keys are not special-cased: null keys compare
  * equal to null keys (use filters upstream for SQL equi-join
  * semantics). Null TIMES follow SQL comparison semantics: right rows
  * with a null time are skipped (they can never satisfy a <=/>=
  * predicate), and a left row with a null time matches nothing and gets
  * the null extension.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Forward direction reuses the identical merge by flipping the time
  // sort to DESCENDING on both sides: "greatest rtime <= ltime over
  // ascending time" and "smallest rtime >= ltime over descending time"
  // are the same keep-last scan.
  private def timeDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val fwd = forward
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      // bind against a NULLABLE view of the right schema: unmatched left
      // rows read from an all-null row, so the generated projection must
      // keep its null checks even when the right child's attrs are
      // declared non-nullable
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _        // fetched, not yet consumed
        private var rDone = false
        private var matchRow: InternalRow = _     // best right row for matchKey
        private var matchKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (matchKey != null && keyOrd.compare(matchKey, lk) != 0) {
            matchRow = null; matchKey = null
          }
          // SQL comparison semantics: a null left time satisfies no
          // <=/>= predicate — emit the null extension without consuming
          // right rows (later left rows will advance past them)
          if (lTimeProj(l).isNullAt(0)) return outProj(joined(l, nullRight))
          var advancing = true
          while (advancing) {
            if (rHead == null && !rDone) {
              if (rIter.hasNext) rHead = rIter.next() else rDone = true
            }
            if (rHead == null) advancing = false
            else {
              val c = keyOrd.compare(rKeyProj(rHead), lk)
              if (c < 0) rHead = null // right key already passed — discard
              else if (c == 0 && rTimeProj(rHead).isNullAt(0)) {
                rHead = null // null right time can never qualify — discard
              } else {
                val tCmp = timeOrd.compare(rTimeProj(rHead), lTimeProj(l))
                if (c == 0 && (if (fwd) tCmp >= 0 else tCmp <= 0)) {
                  matchRow = rHead.copy() // later qualifying rows overwrite
                  matchKey = lk.copy()
                  rHead = null
                } else advancing = false // right ahead — keep for later rows
              }
            }
          }
          outProj(joined(l, if (matchRow != null) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule mapping the logical [[AsOfJoin]] to [[AsOfJoinExec]];
  * injected via `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }
}
