package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator AS-OF join — the Catalyst extension layer (c) of the
  * escalation ladder: a custom logical operator, planned by an injected
  * [[SparkStrategy]] into a custom [[SparkPlan]] that merges the two
  * sorted sides directly.
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.asOf]], which is
  * the composed window formulation of the same join): for every left
  * row, attach the value columns of the most recent right row with
  * `right.ts <= left.ts` within the same key, or NULLs when none
  * precedes it.
  *
  * Physical shape: both children are required hash-clustered on the key
  * and sorted by (key, ts) — EnsureRequirements inserts the exchanges
  * and sorts, exactly as it does for a sort-merge join — and each
  * co-partition is merged with a single forward pointer: O(|L| + |R|)
  * per partition, ONE pass, and per-row state of exactly one buffered
  * right row. Versus the window formulation this skips the union
  * materialization and the window's running-frame machinery; versus a
  * range join it never expands intervals at all.
  *
  * Same uniqueness requirement as the composed form: right must be
  * unique per (key, ts), or ties resolve nondeterministically.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    valueOutput: Seq[Attribute])
    extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  // The executor compares RIGHT-side projected rows with orderings
  // built from LEFT-side data types — a type mismatch would not error,
  // it would read the wrong byte widths and return garbage matches.
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of key type mismatch: ${l.name}: ${l.dataType.simpleString} vs " +
        s"${r.name}: ${r.dataType.simpleString}")
  }
  require(leftTs.dataType == rightTs.dataType,
    s"as-of timestamp type mismatch: ${leftTs.dataType.simpleString} vs " +
      s"${rightTs.dataType.simpleString}")

  override def output: Seq[Attribute] = left.output ++ valueOutput

  /** The planner's default estimate for an unrecognized binary node is
    * the PRODUCT of the children's sizeInBytes — |L| x |R| bytes for an
    * operator that emits EXACTLY one row per left row. That estimate
    * poisons every downstream join choice (a 5 MB as-of result
    * estimated at 25 TB can never be broadcast, forcing shuffle joins
    * above it). Propagate the left child's statistics, widened by the
    * carried right value columns.
    */
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val l = left.stats
    val scale =
      BigDecimal(output.length) / BigDecimal(math.max(1, left.output.length))
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = (BigDecimal(l.sizeInBytes) * scale).toBigInt.max(1),
      rowCount = l.rowCount)
  }

  // valueOutput is minted by this node, not drawn from a child —
  // CheckAnalysis otherwise reports it "missing from input".
  override def producedAttributes: AttributeSet = AttributeSet(valueOutput)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  /** Mints the carried (prefixed, nullable) output attributes exactly
    * once. They are constructor state, not derived per-instance: a
    * `copy()` during an optimizer transform must keep the same exprIds,
    * or references in parent operators dangle.
    */
  def apply(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTs: Attribute,
      rightTs: Attribute,
      rightValues: Seq[Attribute],
      outputPrefix: String): AsOfJoinNode =
    AsOfJoinNode(left, right, leftKeys, rightKeys, leftTs, rightTs,
      rightValues,
      rightValues.map { a =>
        AttributeReference(outputPrefix + a.name, a.dataType, nullable = true)()
      })
}

/** Planner rule: [[AsOfJoinNode]] -> [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.GraftExtensions]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs,
        n.rightValues, n.output, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    outputAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = outputAttrs

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // Hash-cluster both sides on the key and sort by (key, ts):
  // EnsureRequirements provides the exchanges/sorts, and AQE can still
  // coalesce or skew-split them — the operator itself never shuffles.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val numValues = rightValues.length
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = outputAttrs
    // locals for EVERY field the closure touches — referencing the
    // case-class fields below would capture `this` and serialize the
    // whole AsOfJoinExec (both child plan trees) into every task
    val lKeyTsExprs = leftKeys :+ leftTs
    val rKeyTsExprs = rightKeys :+ rightTs
    val rValExprs = rightValues
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key..., ts) projections — compared with the natural ascending
      // interpreted ordering, which matches the required child ordering.
      val lKeyTsProj = UnsafeProjection.create(lKeyTsExprs, leftOut)
      val rKeyTsProj = UnsafeProjection.create(rKeyTsExprs, rightOut)
      val keyOnlyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val keyTsOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes :+ tsType)
      val rValProj = UnsafeProjection.create(rValExprs, rightOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullValues = new GenericInternalRow(numValues)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // last right row (values + key) with keyTs <= current left keyTs
        private var lastValues: InternalRow = _
        private var lastKeyTs: InternalRow = _
        private var rHead: InternalRow = _
        private var rHeadKeyTs: InternalRow = _

        private def advanceRightHead(): Unit = {
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKeyTs = rKeyTsProj(rHead)
          } else {
            rHead = null
            rHeadKeyTs = null
          }
        }
        advanceRightHead()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKeyTs = lKeyTsProj(lRow)
          // consume every right row at or before this left (key, ts)
          while (rHeadKeyTs != null && keyTsOrd.compare(rHeadKeyTs, lKeyTs) <= 0) {
            lastValues = rValProj(rHead).copy()
            lastKeyTs = rHeadKeyTs.copy()
            advanceRightHead()
          }
          // the buffered right row only matches if its KEY equals the
          // left key (its ts is <= by construction); rows sort by key
          // first, so a buffered row from an earlier key never leaks in.
          val matches = lastKeyTs != null &&
            keyOnlyOrd.compare(lastKeyTs, lKeyTs) == 0
          outProj(joined(lRow, if (matches) lastValues else nullValues))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
