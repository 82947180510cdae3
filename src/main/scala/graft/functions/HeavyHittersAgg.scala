package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary: the bounded-state scale path for
  * "top values by count" when the value cardinality is unbounded.
  *
  * Exact top-k counting (`groupBy(value).count` + window rank, the
  * `topk_values_agg` shape) shuffles one row per DISTINCT value — at
  * 100 TB an open-ended key domain (urls, user agents, tokens) makes that
  * reduce state as big as the problem. This aggregate keeps at most
  * `capacity` counters per partial buffer, merges map-side, and ships a
  * capacity-bounded sketch per partition — memory and shuffle volume are
  * fixed by the caller regardless of corpus size.
  *
  * Guarantees (classic MG, preserved under the mergeable-summaries merge):
  *   - every reported count is a LOWER bound of the true count;
  *   - it undercounts by at most n/(capacity+1) (n = stream length), so
  *     any value with true frequency above that threshold is present;
  *   - with `capacity` >= the number of distinct values, no decrement ever
  *     fires anywhere and the summary is EXACT and deterministic (the
  *     regime the oracle-bound query row pins; the approximation regime is
  *     property-tested in HeavyHittersSpec).
  *
  * Output: array<struct<value:string, cnt:long>> of the top `k` entries,
  * ordered by (cnt desc, value asc) — value ties are broken on the value
  * itself so the result is deterministic.
  */
case class HeavyHittersMG(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {
  require(capacity >= 1, s"heavyHitters needs capacity >= 1, got $capacity")
  require(k >= 1 && k <= capacity, s"need 1 <= k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](capacity * 2)

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < capacity) buf.put(s, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  /** MG decrement step: subtract `by` from every counter, dropping any that
    * reach zero — the bounded-memory trade that buys the n/(capacity+1)
    * error bound. */
  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  /** Mergeable-summaries MG merge: sum counters, then if over capacity
    * subtract the (capacity+1)-th largest count from all and drop the
    * non-positive — the summed error bounds add, keeping the global
    * n/(capacity+1) guarantee regardless of merge order. */
  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      // (capacity+1)-th largest = index size-capacity-1 in ascending order
      val threshold = counts(a.size - capacity - 1)
      decrementAll(a, threshold)
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, Long]](buf.entrySet())
    entries.sort(new java.util.Comparator[java.util.Map.Entry[String, Long]] {
      override def compare(x: java.util.Map.Entry[String, Long],
                           y: java.util.Map.Entry[String, Long]): Int = {
        val c = java.lang.Long.compare(y.getValue, x.getValue)
        if (c != 0) c else x.getKey.compareTo(y.getKey)
      }
    })
    val n = math.min(k, entries.size)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = entries.get(i)
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersMG =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersMG =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHittersMG =
    copy(child = newChildren.head)
}

object HeavyHittersAgg {
  /** Aggregate Column: Misra-Gries top-k heavy hitters of string column `c`
    * with at most `capacity` counters per partial buffer. */
  def heavyHitters(c: Column, capacity: Int, k: Int): Column =
    Bridge.column(HeavyHittersMG(Bridge.expression(c), capacity, k).toAggregateExpression())
}
