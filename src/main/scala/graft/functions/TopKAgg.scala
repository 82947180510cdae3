package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact top-k doubles per group with a bounded buffer.
  *
  * `slice(reverse(array_sort(collect_list(x))), 1, k)` materializes the whole
  * group before sorting — at 100 TB a hot group OOMs the task. This
  * TypedImperativeAggregate keeps only k values per partial buffer (a min-
  * heap), merges map-side, and ships at most k doubles per partition —
  * constant memory regardless of group size.
  *
  * Output: array<double> sorted descending (deterministic for value ties —
  * values, not rows, are ranked).
  */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {
  require(k >= 1, s"topK needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  override def update(buf: java.util.PriorityQueue[java.lang.Double],
                      input: org.apache.spark.sql.catalyst.InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (buf.size < k) buf.add(d)
      // compareTo, not '<': the heap orders by Double.compareTo (NaN
      // greatest, -0.0 < 0.0); mixing primitive comparison here would make
      // NaN admission depend on arrival order and break determinism
      else if (buf.peek().compareTo(d) < 0) { buf.poll(); buf.add(d) }
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[java.lang.Double],
                     b: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (a.size < k) a.add(d)
      else if (a.peek().compareTo(d) < 0) { a.poll(); a.add(d) }
    }
    a
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    val out = new Array[Any](arr.length)
    i = 0
    while (i < arr.length) { out(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.add(bb.getDouble); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKDoubles =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** Aggregate Column: exact top-k of `c` per group, descending. Any numeric
    * input is cast to double up front (the buffer is a double heap).
    */
  def topK(c: Column, k: Int): Column =
    Bridge.column(TopKDoubles(Bridge.expression(c.cast("double")), k).toAggregateExpression())
}
