package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter CANDIDATES as a mergeable aggregate
  * (`heavy_hitters(item, capacity)` → array of candidate strings).
  *
  * The 100 TB problem this solves: "which tokens appear in more than
  * 1/m of the corpus" normally needs a full `groupBy(token)` — a
  * shuffle of the entire vocabulary (billions of keys) to answer a
  * question whose answer has at most m rows. Misra-Gries keeps a
  * BOUNDED summary of `capacity` counters per partial aggregate, so
  * only `capacity` rows per mapper cross the shuffle, with the classic
  * guarantee: every item with true frequency > N/(capacity+1) is in
  * the final candidate set (undercounted, never missed). Candidates
  * then get ONE cheap exact recount (a semi-join-pruned groupBy over
  * ≤ capacity keys) — battery q88 wires the full two-pass pattern and
  * its DuckDB oracle proves no heavy hitter was dropped.
  *
  * Merging two summaries sums counts and, when over capacity, subtracts
  * the (capacity+1)-th largest count from all and drops the non-positive
  * — the mergeable-summaries construction (Agarwal et al., PODS 2012),
  * which preserves the N/(capacity+1) error bound under any merge tree,
  * i.e. under any partitioning. The candidate SET can vary with
  * partition order (extra light items may survive); the GUARANTEED
  * members never do, and the exact recount makes the final answer
  * deterministic.
  */
case class HeavyHitters(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"heavy_hitters capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString // copy: row buffers are reused
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < capacity => buf.update(s, 1L)
        case None =>
          // decrement-all step: amortized O(1) — every decrement is
          // paid for by an earlier increment
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c == 0) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count; ≤ capacity strictly
      // greater entries survive
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { k =>
        val c = a(k) - t
        if (c <= 0) dead += k else a.update(k, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val byteArrays = entries.map { case (k, _) => k.getBytes("UTF-8") }
    val bb = ByteBuffer.allocate(4 + byteArrays.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length).put(byteArrays(i)).putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len); bb.get(kb)
      buf.update(new String(kb, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
}

object HeavyHitters {

  /** Column API: candidate items (sorted array<string>) covering every
    * item with frequency > N/(capacity+1). */
  def candidates(item: Column, capacity: Int): Column =
    GraftSqlBridge.column(HeavyHitters(
      GraftSqlBridge.expression(item.cast("string")), capacity).toAggregateExpression())
}
