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

/** Bottom-k (sortKey, id) pairs per group with a bounded buffer — the
  * deterministic uniform sampler.
  *
  * Ordering every group member with a window `row_number` sorts the whole
  * group to emit k rows; at 100 TB a hot stratum serializes one task. This
  * aggregate keeps only the k smallest pairs per partial buffer (a max-heap
  * of what's admitted so far), merges map-side, and ships at most k pairs
  * per partition — constant memory and shuffle regardless of group size,
  * the same bounded-state contract as the sketch family.
  *
  * With `sortKey` a salted portable digest of a unique row id (the
  * `Curation.hashPct` md5 family), bottom-k IS a uniform sample without
  * replacement: every subset of size k is equally likely over the digest
  * randomness, the pick is reproducible run-to-run, and ANY engine can
  * replay it (ORDER BY md5(...) LIMIT k) — no RNG state, no seed plumbing,
  * merge-order independent by construction.
  *
  * Output: array<struct<key:string, id:long>> sorted ascending by
  * (key, id) — the (digest, id) pair is unique per row, so the result and
  * its order are fully deterministic.
  */
case class BottomKByKey(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(String, Long)]] {
  require(k >= 1, s"bottomK needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  // max-heap on (key, id): the head is the WORST admitted pair, evicted
  // when a smaller one arrives (shared serializable instance — the
  // expression ships with the task closure)
  private def maxFirst = BottomKByKey.MaxFirst

  override def createAggregationBuffer(): java.util.PriorityQueue[(String, Long)] =
    new java.util.PriorityQueue[(String, Long)](k + 1, maxFirst)

  private def admit(buf: java.util.PriorityQueue[(String, Long)], p: (String, Long)): Unit = {
    if (buf.size < k) buf.add(p)
    else if (maxFirst.compare(buf.peek(), p) < 0) { buf.poll(); buf.add(p) }
  }

  override def update(buf: java.util.PriorityQueue[(String, Long)],
                      input: InternalRow): java.util.PriorityQueue[(String, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    // a null digest or id has no place in a deterministic order — skip,
    // mirroring how SQL ORDER BY ... LIMIT k with NULLS LAST never picks it
    if (kv != null && iv != null) {
      admit(buf, (kv.asInstanceOf[UTF8String].toString, iv.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[(String, Long)],
                     b: java.util.PriorityQueue[(String, Long)]): java.util.PriorityQueue[(String, Long)] = {
    val it = b.iterator()
    while (it.hasNext) admit(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[(String, Long)]): Any = {
    val arr = new java.util.ArrayList[(String, Long)](buf)
    // ascending output order = reverse of the max-heap comparator
    arr.sort(maxFirst.reversed())
    val out = new Array[Any](arr.size)
    var i = 0
    while (i < arr.size) {
      val (s, v) = arr.get(i)
      out(i) = new GenericInternalRow(Array[Any](UTF8String.fromString(s), v))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, v) = it.next()
      val kb = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      q.add((new String(kb, StandardCharsets.UTF_8), bb.getLong))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKByKey =
    copy(key = newChildren(0), id = newChildren(1))
}

object BottomKByKey {
  /** Descending (key, id) order: heap head = worst admitted pair. */
  object MaxFirst extends java.util.Comparator[(String, Long)] with Serializable {
    override def compare(a: (String, Long), b: (String, Long)): Int = {
      val c = b._1.compareTo(a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }
}

object BottomKAgg {
  /** Aggregate Column: the k smallest (key, id) pairs of the group, sorted
    * ascending — with a digest key, a deterministic uniform k-sample. */
  def bottomKByKey(key: Column, id: Column, k: Int): Column =
    Bridge.column(BottomKByKey(Bridge.expression(key), Bridge.expression(id), k)
      .toAggregateExpression())
}
