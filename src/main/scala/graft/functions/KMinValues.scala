package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-Minimum-Values distinct sketch: keeps the `k` smallest DISTINCT
  * values of a Long column (here: [[PolyHash]] hashes) in a bounded
  * buffer; the distinct cardinality estimate is `(k-1)·p / h_k` where
  * `h_k` is the k-th smallest hash under modulus p.
  *
  * This is the bounded-memory cardinality path for 100-TB corpora:
  * `count_distinct` shuffles every distinct value; this aggregate
  * shuffles at most k longs per group per partition (classic KMV /
  * bottom-k sketch). Implemented as a `TypedImperativeAggregate` — the
  * Catalyst extension point for aggregation state that isn't a fixed-
  * width row — with compact Long-array serialization for partial
  * aggregation across the exchange.
  *
  * Because the hash is the deterministic portable [[PolyHash]], the
  * sketch content — and therefore the estimate — is bit-reproducible in
  * DuckDB SQL (sort the distinct hashes, take the k-th), which makes
  * even the APPROXIMATE operator oracle-checkable. Returns the sorted
  * ascending array of retained hashes; the caller derives the estimate
  * (exact size when |values| < k).
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k > 1, "KMV needs k > 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmin_values"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def insert(buf: java.util.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && !buf.contains(v)) {
      buf.pollLast(); buf.add(v); ()
    }
  }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow)
      : java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // ascending (TreeSet order)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KMinValues {
  /** Column API: sorted array of the k smallest distinct values. */
  def apply(c: Column, k: Int): Column =
    GraftShims.column(
      KMinValues(GraftShims.expression(c), k).toAggregateExpression())
}
