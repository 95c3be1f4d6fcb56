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
                        strict: Boolean, tolerance: Long = Long.MaxValue)
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
                        strict: Boolean, tolerance: Long = Long.MaxValue)
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
    val tol = tolerance
    val keyType = leftBy.dataType
    val onType = leftOn.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // interpreted total orders on the by-key's and on-key's types:
      // work for any ordered DataType (integral, string, decimal,
      // timestamp, ...) and match the ASC NULLS FIRST sort this node
      // requires of its children
      val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(keyType)
      val onOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(onType)
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
      var bufferedOn: Long = 0L // numeric on-value, tracked when tol set

      def admissible(rT: Any, lT: Any): Boolean = {
        val c = onOrd.compare(rT, lT)
        if (strictCmp) c < 0 else c <= 0
      }
      // tolerance mode: on-values are numeric/timestamp (validated in
      // AsOf.join), stored as integral internals → safe longValue
      val checkTol = tol != Long.MaxValue
      def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()

      lIter.map { lRow =>
        val lKey = lByBound.eval(lRow)
        val lTime = lOnBound.eval(lRow)
        if (lKey == null || lTime == null) {
          // SQL join semantics: a NULL by-key matches nothing, and a
          // NULL left `on` has no "prior" point in time — both emit the
          // null-filled right side. (Null-key right rows, which sort
          // first under NULLS FIRST, are never admitted into the buffer
          // below either; with a null lTime we also must not advance the
          // right side, since admissibility is undefined.)
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
            } else if (cmp == 0) {
              val rT = rOnBound.eval(rHead)
              if (rT == null) {
                // null right `on` (sorts first in its group): never
                // admissible — skip it rather than stall the advance
                rHead = if (rIter.hasNext) rIter.next().copy() else null
                continue = rHead != null
              } else if (admissible(rT, lTime)) {
                buffered = rHead; bufferedBy = rKey
                if (checkTol) bufferedOn = asLong(rT)
                rHead = if (rIter.hasNext) rIter.next().copy() else null
                continue = rHead != null
              } else continue = false
            } else continue = false
          }
          // the buffered row is the LATEST admissible one, so if it is
          // outside the lookback tolerance, no earlier row is inside
          // it. Tolerance test = bufferedOn >= lTime - tol, with the
          // subtraction underflow (extreme negative lTime - tol wraps
          // positive) treated as "window covers everything" — a naive
          // lTime - bufferedOn difference can overflow Long and wrongly
          // admit a far-stale row.
          def withinTol: Boolean = {
            val lT = asLong(lTime)
            val lo = lT - tol
            lo > lT || bufferedOn >= lo
          }
          val r = if (buffered != null && bufferedBy != null
            && keyOrd.compare(bufferedBy, lKey) == 0
            && (!checkTol || withinTol)) buffered
          else nullRight
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
    * both; on = ordering columns (left/right). `tolerance` bounds the
    * lookback in the on-key's native internal units (µs for timestamps,
    * the value itself for integrals): a prior right row further back
    * than that yields the null fill instead — pandas/flink-style
    * `merge_asof(tolerance=...)`. Tolerance requires an
    * integral/timestamp/date on-type. */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
           leftBy: String, rightBy: String,
           leftOn: String, rightOn: String,
           strict: Boolean = false,
           tolerance: Long = Long.MaxValue): DataFrame = {
    register(spark)
    // fail fast with a typed error instead of a runtime cast/sort crash
    val lOnT = left.schema(leftOn).dataType
    val rOnT = right.schema(rightOn).dataType
    require(lOnT == rOnT,
      s"as-of `on` columns must share one data type; got $lOnT vs $rOnT")
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(lOnT),
      s"as-of `on` type $lOnT has no total order")
    if (tolerance != Long.MaxValue) {
      import org.apache.spark.sql.types._
      require(tolerance >= 0, s"as-of tolerance must be non-negative: $tolerance")
      val numericInternal = lOnT match {
        case LongType | IntegerType | ShortType | ByteType |
             TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
      require(numericInternal,
        s"as-of tolerance requires an integral/timestamp/date `on` type; got $lOnT")
    }
    val plan = AsOfJoinPlan(
      GraftBridge.logicalPlan(left), GraftBridge.logicalPlan(right),
      GraftBridge.expression(left(leftBy)), GraftBridge.expression(right(rightBy)),
      GraftBridge.expression(left(leftOn)), GraftBridge.expression(right(rightOn)),
      strict, tolerance)
    GraftBridge.dataset(spark, plan)
  }

  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lb, rb, lo, ro, st, tol) =>
        AsOfJoinExec(planLater(l), planLater(r), lb, rb, lo, ro, st, tol) :: Nil
      case _ => Nil
    }
  }
}
