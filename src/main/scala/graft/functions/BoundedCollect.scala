package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Collects up to `limit` DISTINCT-ROW Long values per group, then
  * saturates: once the buffer holds `limit` values, further inputs are
  * dropped (the group is known to exceed the caller's cap and will be
  * filtered out, so WHICH values it holds no longer matters).
  *
  * This is the memory-safe posting-list builder for the n-gram dedup's
  * candidate stage: `collect_list` on a corpus-boilerplate gram would
  * buffer millions of doc ids on one reducer before the over-cap filter
  * discards them — this aggregate's state is at most `limit` longs per
  * group per partition, under ANY skew, and partial buffers merge with
  * the same bound across the exchange. Output is the ascending-sorted
  * array when the group stayed under the limit (exact, order-free), or
  * a `limit`-sized sentinel array the caller drops via
  * `size(ids) < limit`.
  */
case class BoundedCollect(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(limit > 0, "BoundedCollect needs a positive limit")

  override def children: Seq[Expression] = Seq(child)
  // update() reads the child as a Long — declaring the input type turns a
  // non-BIGINT argument into a clean analysis error instead of a mid-job
  // ClassCastException
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect"

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](math.min(limit, 16))

  override def update(buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length < limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.ArrayBuffer[Long],
      other: scala.collection.mutable.ArrayBuffer[Long])
      : scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (buf.length < limit && i < other.length) {
      buf += other(i); i += 1
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr.map(_.asInstanceOf[Any]))
  }

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BoundedCollect {
  /** Column API: ascending array of up to `limit` collected values. */
  def apply(c: Column, limit: Int): Column =
    GraftShims.column(
      BoundedCollect(GraftShims.expression(c), limit).toAggregateExpression())
}
