package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native per-group top-k aggregate (`topk_by(order, payload, k)` →
  * payloads of the k largest orders, ties broken by payload asc).
  *
  * The window-function formulation (`row_number over (partition by g
  * order by o desc) <= k`, battery q50) shuffles EVERY row to sort
  * whole partitions. This `TypedImperativeAggregate` is algebraic: the
  * map side keeps a bounded buffer of ≤ k candidates per group, so only
  * k rows per group per mapper cross the shuffle — at 100 TB that is
  * the difference between shuffling the table and shuffling k·|groups|
  * rows. Buffers serialize as flat (double, long) byte pairs.
  *
  * Buffer compaction is amortized: appends run unsorted until 4k+16
  * entries, then one O(n log n) prune back to k keeps update cost
  * O(log k) amortized without a tree structure per row.
  */
case class TopKBy(
    order: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, s"topk_by k must be positive, got $k")

  override def children: Seq[Expression] = Seq(order, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  private def prune(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    if (buf.length <= k) buf
    else {
      val best = buf.sortBy { case (o, p) => (-o, p) }.take(k)
      buf.clear()
      buf ++= best
    }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val o = order.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null) {
      buf += ((o.asInstanceOf[Double], p.asInstanceOf[Long]))
      if (buf.length > 4 * k + 16) prune(buf)
    }
    buf
  }

  override def merge(
      a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    a ++= b
    prune(a)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      buf.sortBy { case (o, p) => (-o, p) }.take(k).map(_._2).toArray)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val pruned = prune(buf)
    val bb = ByteBuffer.allocate(4 + pruned.length * 16)
    bb.putInt(pruned.length)
    pruned.foreach { case (o, p) => bb.putDouble(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(order = newChildren(0), payload = newChildren(1))
}

object TopKBy {

  /** Column API: payloads (as LongType) of the k largest `order` values
    * per group, ties by payload asc — deterministic for unique payloads. */
  def topkBy(order: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(TopKBy(
      GraftSqlBridge.expression(order.cast("double")),
      GraftSqlBridge.expression(payload.cast("long")), k).toAggregateExpression())
}
