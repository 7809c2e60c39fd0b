package org.apache.spark.sql
package graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join: each left row matches one right row of the same key,
  * picked by `direction` (and within `toleranceUs`, when ≥ 0); unmatched
  * left rows survive with nulls (left-outer).
  *
  *  - `backward` (default): the latest right row with time ≤ left time.
  *  - `forward`: the earliest right row with time ≥ left time.
  *  - `nearest`: whichever of the two is closer in time; an exact
  *    distance tie keeps the backward row.
  *
  * `allowExactMatches = false` (pandas merge_asof's flag) makes both
  * inequalities strict: equal-time rows are never matched — in
  * backward/nearest they park in an O(1) side buffer until the left
  * time moves past them, in forward they are dead and dropped.
  *
  * NULL semantics follow SQL join semantics: a NULL key or NULL time on
  * either side never matches — left rows with NULL key/time pass through
  * unmatched, right rows with NULL key/time are skipped. Ties among
  * right rows with equal (key, time) are broken by `rightSeq`: backward
  * keeps the LAST in ascending seq (the largest, mirroring `ORDER BY
  * time DESC, seq DESC LIMIT 1`), forward keeps the FIRST (the
  * smallest, mirroring `ORDER BY time ASC, seq ASC LIMIT 1`); without a
  * seq the winner would be arrival order, i.e. nondeterministic under
  * shuffle.
  *
  * This is the one operator family in the engine where composing
  * built-ins genuinely fails at scale: an inequality join explodes to a
  * range join (O(n·m) within key), and the union-window trick cannot
  * express a tolerance. So it follows the custom-operator recipe —
  * logical node → planner strategy → physical exec — and the physical
  * operator DECLARES its needs instead of hand-scheduling them:
  * `requiredChildDistribution` (co-partition both sides by key) and
  * `requiredChildOrdering` (key, time) make Catalyst insert the
  * exchanges and sorts, AQE still owns partition sizing, and the merge
  * itself is a single forward pass per partition holding ONE buffered
  * right row per key — O(1) state, no per-key materialization.
  *
  * Lives in an `org.apache.spark.sql` subpackage because SparkPlan's
  * execution surface (`doExecute`) is `private[sql]` in Spark 4.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Long,
    rightSeq: Seq[Expression],
    direction: String = "backward",
    allowExactMatches: Boolean = true)
    extends BinaryNode {
  require(AsOfJoinApi.Directions(direction),
    s"as-of direction must be one of ${AsOfJoinApi.Directions}, got '$direction'")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, rs, dir, exact) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, rs, dir,
        exact) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Long,
    rightSeq: Seq[Expression],
    direction: String = "backward",
    allowExactMatches: Boolean = true)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Right side additionally orders by the tie-break sequence: among
  // equal (key, time) rows the merge keeps the LAST seen, so ascending
  // seq makes the largest seq the deterministic winner.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightSeq)).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val tol = toleranceUs
    val dir = direction
    val exact = allowExactMatches
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val lKeyProj = UnsafeProjection.create(lk, leftOut)
        private val rKeyProj = UnsafeProjection.create(rk, rightOut)
        private val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
        private val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
        private val keyOrdering =
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .createNaturalAscendingOrdering(lk.map(_.dataType))
        // Bind to nullable-forced right attributes on BOTH sides of the
        // binding: bindReference takes nullability from the INPUT
        // attribute, so a non-nullable right child column would
        // otherwise skip the isNullAt check and read an unmatched
        // null slot as 0.
        private val joiner = UnsafeProjection.create(
          leftOut ++ rightOut.map(_.withNullability(true)),
          leftOut ++ rightOut.map(_.withNullability(true)))
        private val nullRight = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(rightOut.length)
        private val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow

        private val rBuf = rIter.buffered
        // One buffered candidate: the latest right row (copied) whose
        // key equals `curKey` and time <= (strict: <) the left row's
        // time. In strict mode, rows at EXACTLY the current left time
        // park in `eqCandidate` — ineligible now, but the latest of
        // them becomes the backward candidate once the left time moves
        // past them (still O(1) state).
        private var curKey: InternalRow = _
        private var candidate: InternalRow = _
        private var candidateTime: Long = 0L
        private var eqCandidate: InternalRow = _
        private var eqTime: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val key = lKeyProj(lRow)
          val lTimeRow = lTimeProj(lRow)
          // NULL key or NULL time on the left never matches. These rows
          // sort first (Ascending = NullsFirst), so skipping the advance
          // here cannot starve later left rows of right-side progress.
          if (key.anyNull || lTimeRow.isNullAt(0)) {
            joined(lRow, nullRight)
            return joiner(joined)
          }
          val t = lTimeRow.getLong(0)
          if (curKey == null || keyOrdering.compare(key, curKey) != 0) {
            curKey = key.copy()
            candidate = null
            eqCandidate = null
          } else if (eqCandidate != null && eqTime < t) {
            // The left time moved past the parked equal-time rows:
            // they are strictly earlier now, and the last of them is
            // later in stream order than any current candidate.
            candidate = eqCandidate; candidateTime = eqTime
            eqCandidate = null
          }
          // Advance the right side through all rows with key < curKey,
          // then through rows of curKey on this side of t. Backward and
          // nearest consume rows with time <= t keeping the last as the
          // backward candidate (ordering puts the tie-break seq
          // ascending, so last = max seq); forward consumes time < t
          // strictly and keeps nothing, so an exact-equal row stays
          // ahead as the forward candidate. In STRICT mode
          // (allowExactMatches = false) rows at exactly t are consumed
          // but parked (backward/nearest) or dropped (forward — an
          // equal-time row can never match any later left row either),
          // so the head after the advance is the first row with
          // time > t — exactly the strict forward candidate. Right rows
          // with NULL key/time are consumed and dropped — they can
          // never match.
          val keepBack = dir != "forward"
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            val rTimeRow = rTimeProj(rRow)
            if (rKey.anyNull || rTimeRow.isNullAt(0)) { rBuf.next() }
            else {
              val cmp = keyOrdering.compare(rKey, curKey)
              if (cmp < 0) { rBuf.next() }
              else if (cmp > 0) { advancing = false }
              else {
                val rT = rTimeRow.getLong(0)
                if (rT < t) {
                  if (keepBack) { candidate = rRow.copy(); candidateTime = rT }
                  rBuf.next()
                } else if (rT == t) {
                  if (exact && keepBack) {
                    candidate = rRow.copy(); candidateTime = rT
                    rBuf.next()
                  } else if (exact) {
                    // forward-exact: the head IS the match — leave it.
                    advancing = false
                  } else if (keepBack) {
                    // strict backward/nearest: park, eligible once the
                    // left time moves past t.
                    eqCandidate = rRow.copy(); eqTime = rT
                    rBuf.next()
                  } else {
                    // strict forward: dead row (no later left can use it).
                    rBuf.next()
                  }
                } else advancing = false
              }
            }
          }
          // Forward candidate: the (unconsumed) head, iff it still
          // carries this key — it is the earliest right row with
          // time >= t (forward) / time > t (nearest), and first in
          // ascending seq among equal times. Peeked, never consumed:
          // later left rows of the key may need it again.
          var fwdRow: InternalRow = null
          var fwdTime = 0L
          if (dir != "backward" && rBuf.hasNext) {
            val h = rBuf.head
            val hKey = rKeyProj(h)
            val hTimeRow = rTimeProj(h)
            if (!hKey.anyNull && !hTimeRow.isNullAt(0) &&
                keyOrdering.compare(hKey, curKey) == 0) {
              fwdRow = h; fwdTime = hTimeRow.getLong(0)
            }
          }
          val backOk = dir != "forward" && candidate != null &&
            (tol < 0 || t - candidateTime <= tol)
          val fwdOk = dir != "backward" && fwdRow != null &&
            (tol < 0 || fwdTime - t <= tol)
          // nearest: smaller distance wins, exact tie keeps backward.
          val pick: InternalRow =
            if (backOk && fwdOk)
              if (t - candidateTime <= fwdTime - t) candidate else fwdRow
            else if (backOk) candidate
            else if (fwdOk) fwdRow
            else nullRight
          joined(lRow, pick)
          joiner(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinApi {
  /** The supported match directions (pandas merge_asof's vocabulary). */
  val Directions: Set[String] = Set("backward", "forward", "nearest")

  /** Build the as-of-join DataFrame (Dataset.ofRows is private[sql]). */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      toleranceUs: Long,
      rightSeq: Seq[Column] = Nil,
      direction: String = "backward",
      allowExactMatches: Boolean = true): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      leftKeys.map(ColumnBridge.expression),
      rightKeys.map(ColumnBridge.expression),
      ColumnBridge.expression(leftTime),
      ColumnBridge.expression(rightTime),
      toleranceUs,
      rightSeq.map(ColumnBridge.expression),
      direction,
      allowExactMatches)
    classic.Dataset.ofRows(spark, plan)
  }
}
