package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the preference-order-(c) operator from the
  * build brief: a custom LogicalPlan + SparkStrategy + SparkPlan for
  * whole-operator semantics Spark lacks. The composed form
  * ([[graft.ops.AsOf.asofJoin]]'s union-merge) is correct and
  * one-shuffle, but it materializes the union, runs a WindowExec
  * (buffering, frame bookkeeping), and filters half the rows back
  * out. This exec does what a native engine does: shuffle each side
  * on its key, sort by (key, time), and stream-merge the two sorted
  * runs in ONE forward pass per partition — no union row ever
  * exists, no window buffer, O(1) state (the current candidate row).
  *
  * Semantics: LEFT OUTER point-in-time — for each left row, the LAST
  * right row with the same key and `rightTime <= leftTime`
  * (inclusive, matching DuckDB `ASOF JOIN ... ON l.t >= r.t`). Rows
  * whose key or time is NULL never match (and null right keys/times
  * are skipped), mirroring join-key null semantics. Ties at equal
  * (key, time) on the right are resolved by whatever total order the
  * caller established BEFORE the join (the registered query
  * pre-collapses them, the same max_by discipline as the composed
  * form), because the required child ordering here is only
  * (key, time).
  *
  * Constraints (checked by the strategy): key and time expressions
  * must be LongType/TimestampType — both compare as signed longs.
  *
  * `nearest = true` switches to pandas `merge_asof
  * direction='nearest'` semantics: the matched right row minimizes
  * |rightTime − leftTime| in EITHER direction, ties to the earlier
  * (backward) row. The merge keeps exactly one extra word of state —
  * the head of the right run is already the first same-key row with
  * rightTime > leftTime when the backward scan stops, so "nearest" is
  * one comparison between the last-consumed candidate and that head;
  * still a single forward pass, still O(1) state. Rows at equal
  * (key, time) on the right must be pre-collapsed by the caller
  * (same contract as backward mode).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    nearest: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; a no-op for every
  * other node. Installed per-session via
  * `spark.experimental.extraStrategies` by the query builders (plain
  * sessions — Verify, Bench, the driver — need no setup call), and
  * via [[GraftExtensions]] for library users.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, near) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, near) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    nearest: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash-cluster both sides on their keys: EnsureRequirements gives
    * the two shuffles the same partition count, and equal keys hash
    * to the same partition id on both sides — the co-location
    * contract SortMergeJoinExec relies on.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  /** Sorted (key, time) runs per partition; the merge below is a
    * single forward pass over each.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    // capture plain values, not `this`, in the partition closure
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val nearestMode = nearest
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyP = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rKeyP = UnsafeProjection.create(Seq(rk, rt), rOut)
      // bind against outAttrs (right side FORCED nullable), not
      // lOut ++ rOut: a non-nullable right child attribute would make
      // the generated projection skip its null check and read 0/false
      // from the all-null outer row
      val resultP = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // backward candidate: the last right row seen with rTime <= the
      // current left time, valid only while its key equals the left key
      var cand: InternalRow = null
      var candKey = 0L
      var candTime = 0L
      // head of the unconsumed right run, with its (key, time)
      // decoded once per advance — null-keyed/-timed rows are skipped
      // here, so a non-advancing left row can reuse the cached values
      var rHead: InternalRow = null
      var rHeadKey = 0L
      var rHeadTime = 0L
      var rHeadOk = false
      def advance(): Unit = {
        rHeadOk = false
        rHead = null
        while (!rHeadOk && rIter.hasNext) {
          val n = rIter.next()
          val rkt = rKeyP(n)
          if (!rkt.isNullAt(0) && !rkt.isNullAt(1)) {
            rHead = n
            rHeadKey = rkt.getLong(0)
            rHeadTime = rkt.getLong(1)
            rHeadOk = true
          }
        }
      }
      advance()
      lIter.map { l =>
        val lkt = lKeyP(l)
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          resultP(joined(l, nullRight))
        } else {
          val lKeyV = lkt.getLong(0)
          val lTimeV = lkt.getLong(1)
          while (rHeadOk && (rHeadKey < lKeyV ||
              (rHeadKey == lKeyV && rHeadTime <= lTimeV))) {
            if (rHeadKey == lKeyV) {
              cand = rHead.copy(); candKey = lKeyV; candTime = rHeadTime
            }
            advance()
          }
          // at loop exit rHead (if same-keyed) is the FIRST right row
          // with rTime > lTime — the forward candidate nearest mode
          // needs, already in hand: left rows only move forward, so
          // nothing before it can be needed again
          val back = cand != null && candKey == lKeyV
          val fwd = nearestMode && rHeadOk && rHeadKey == lKeyV
          val pick =
            if (back && (!fwd || lTimeV - candTime <= rHeadTime - lTimeV)) cand
            else if (fwd) rHead
            else nullRight
          resultP(joined(l, pick))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
