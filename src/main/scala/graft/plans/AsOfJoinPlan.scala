package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward as-of join as a FULL custom operator — logical node +
  * planner strategy + physical sort-merge exec (SURVEY §7.3 option (c),
  * the tier beyond composing built-ins). The composition form
  * ([[graft.operators.AsOfJoin]], union+window) stays the default; this
  * native operator is the single-pass alternative: both sides hash-
  * partition on the key and sort by (key, time), then one streaming
  * merge per partition emits the latest right row ≤ each left time —
  * no union, no row_number, no filter-on-marker pass.
  *
  * Scale shape: exactly two exchanges (one per side, inserted by
  * EnsureRequirements from the declared distribution), sorts feed a
  * streaming O(|L|+|R|) merge with O(1) state per partition — the same
  * wire cost as a sort-merge join, minus the equi-join's buffering of
  * equal-key groups.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute], inner: Boolean)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(!inner))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. Registered on
  * `spark.experimental.extraStrategies` (or via GraftExtensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, pay, inner) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, pay, inner) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute], inner: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(!inner))

  // co-partition both sides on the key; EnsureRequirements inserts the
  // exchanges, CoalesceShufflePartitions keeps them aligned under AQE
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKey = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTime = BindReferences.bindReference(leftTime: Expression, lOut)
    val rKey = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTime = BindReferences.bindReference(rightTime: Expression, rOut)
    val payloadExprs = rightPayload.map(a => BindReferences.bindReference(a: Expression, rOut))
    val innerFlag = inner
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rProj = UnsafeProjection.create(payloadExprs)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(payloadExprs.length)(null))

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var lastMatch: InternalRow = _ // projected + copied payload
        private var lastMatchKey: Any = _
        private var nextRow: InternalRow = _
        private var computed = false

        private def cmpKeys(a: Any, b: Any): Int = keyOrd.compare(a, b)

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKey.eval(l)
            val lt = lTime.eval(l)
            if (lk != null) {
              // consume right rows usable by this (and any later) left row:
              // key strictly before lk, or same key with time <= lt
              var continue = rCur != null
              while (continue) {
                val rk = rKey.eval(rCur)
                val c = if (rk == null) -1 else cmpKeys(rk, lk)
                if (c < 0 || (c == 0 && timeOrd.compare(rTime.eval(rCur), lt) <= 0)) {
                  if (c == 0) { lastMatch = rProj(rCur).copy(); lastMatchKey = rk }
                  rCur = if (rIter.hasNext) rIter.next() else null
                  continue = rCur != null
                } else continue = false
              }
              val matched = lastMatch != null && lastMatchKey != null &&
                cmpKeys(lastMatchKey, lk) == 0
              if (matched) nextRow = resultProj(joined(l, lastMatch))
              else if (!innerFlag) nextRow = resultProj(joined(l, nullRight))
            } else if (!innerFlag) {
              nextRow = resultProj(joined(l, nullRight))
            }
          }
        }

        // advance LAZILY in hasNext: resultProj reuses one row buffer, so
        // the next row may only be computed after the consumer is done
        // with the previous one (the standard volcano-iterator contract)
        override def hasNext: Boolean = {
          if (!computed) { advance(); computed = true }
          nextRow != null
        }
        override def next(): InternalRow = {
          if (!computed) advance()
          computed = false
          nextRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** Make the strategy available on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of join via the native operator: for each left row,
    * the latest right row with the same key and time ≤ left time.
    * `payload` names the right columns carried to the output. */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], inner: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    require(attr(lPlan, leftTime).dataType == attr(rPlan, rightTime).dataType,
      s"as-of time columns must share a type; got ${attr(lPlan, leftTime).dataType} vs " +
        s"${attr(rPlan, rightTime).dataType} — cast one side first")
    require(attr(lPlan, leftKey).dataType == attr(rPlan, rightKey).dataType,
      s"as-of key columns must share a type; got ${attr(lPlan, leftKey).dataType} vs " +
        s"${attr(rPlan, rightKey).dataType} — cast one side first")
    GraftSqlBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan, attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      payload.map(attr(rPlan, _)), inner))
  }
}
