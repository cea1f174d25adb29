package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary over a string column: at most
  * `capacity` counters per aggregation buffer, under ANY input skew.
  *
  * Guarantee (Misra-Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): every item with true frequency
  * f > N/(capacity+1) is present in the output, and each retained
  * counter undercounts by at most N/(capacity+1). The summary is
  * mergeable with the SAME bound — partial buffers combine across the
  * exchange by adding counts and then subtracting the (capacity+1)-th
  * largest count from all — so the distributed aggregation is exactly as
  * strong as the sequential algorithm.
  *
  * This is a CANDIDATE generator, not an exact counter: the counts are
  * lower bounds and the set may contain false positives, so the output
  * is the candidate ITEM array only. [[graft.operators.TextAnalysis
  * .heavyHitters]] re-counts the candidates exactly in a second pass,
  * which turns the sketch into a deterministic, oracle-checkable exact
  * answer (the superset guarantee makes the second pass lossless at any
  * partitioning).
  *
  * State: ≤ capacity (string, long) pairs per partition per group —
  * compare `collect_list`/full word shuffle, whose state is the corpus.
  * Cost is amortized O(1) per row: a decrement-all pass removes
  * `capacity` units of count mass and total mass added is N.
  */
case class FrequentWords(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
  with ExpectsInputTypes {

  require(capacity > 0, "FrequentWords needs a positive capacity")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "frequent_words"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    new scala.collection.mutable.HashMap[String, Long]()

  override def update(buf: scala.collection.mutable.HashMap[String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the reused UTF8String backing buffer before keying
      val s = v.asInstanceOf[UTF8String].toString
      FrequentWords.mgUpdate(buf, s, capacity)
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[String, Long],
      other: scala.collection.mutable.HashMap[String, Long])
      : scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count; ≤ capacity survive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      FrequentWords.decrementAll(buf, cut)
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    val items = buf.keysIterator.toArray
    java.util.Arrays.sort(items, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(items.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    var bytes = 4
    val encoded = entries.map { case (k, _) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      bytes += 4 + b.length + 8
      b
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(encoded(i).length)
      bb.put(encoded(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new scala.collection.mutable.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentWords =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentWords =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FrequentWords {
  /** Column API: ascending array of ≤ `capacity` candidate items. */
  def apply(c: Column, capacity: Int): Column =
    GraftShims.column(
      FrequentWords(GraftShims.expression(c), capacity).toAggregateExpression())

  /** The sequential Misra-Gries step — shared by the batch aggregate's
    * `update` and the streaming state op
    * ([[graft.streaming.StreamOps.streamingHeavyHitters]]), so batch
    * and streaming agree on the summary semantics. */
  def mgUpdate(buf: scala.collection.mutable.HashMap[String, Long],
      s: String, capacity: Int): Unit =
    buf.get(s) match {
      case Some(c) => buf.update(s, c + 1)
      case None =>
        if (buf.size < capacity) buf.update(s, 1L)
        else decrementAll(buf, 1L) // MG: new item cancels one unit everywhere
    }

  private[functions] def decrementAll(
      buf: scala.collection.mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = scala.collection.mutable.ArrayBuffer.empty[String]
    buf.foreach { case (k, c) =>
      if (c <= by) dead += k else buf.update(k, c - by)
    }
    dead.foreach(buf.remove)
  }
}
