package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

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
  * deterministic uniform sampler as an AGGREGATE.
  *
  * The batch path for this shape is a digest-ordered window `row_number`
  * (Catalyst's WindowGroupLimit already bounds per-group state on both
  * sides of the shuffle — measured faster than this aggregate at 20M rows,
  * see SURVEY §5). This aggregate exists for where a window cannot go:
  * STREAMING group-bys, whose per-window state must live in an aggregation
  * buffer that round-trips the state store — there, k pairs per window is
  * the bounded-state contract, identical in spirit to the sketch family.
  *
  * With `sortKey` a salted portable digest of a unique row id (the
  * `Curation.hashPct` md5 family), bottom-k IS a uniform sample without
  * replacement: every subset of size k is equally likely over the digest
  * randomness, the pick is reproducible run-to-run, and ANY engine can
  * replay it (ORDER BY md5(...) LIMIT k) — no RNG state, no seed plumbing,
  * merge-order independent by construction.
  *
  * Keys are compared in UTF-8 binary order (identical to lexicographic for
  * the hex digests this is built for; no per-row String decode).
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
  extends TypedImperativeAggregate[java.util.PriorityQueue[(UTF8String, Long)]] {
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

  override def createAggregationBuffer(): java.util.PriorityQueue[(UTF8String, Long)] =
    new java.util.PriorityQueue[(UTF8String, Long)](k + 1, maxFirst)

  /** Admission with `owned = false` defers the defensive copy of the
    * UTF8String (whose bytes alias a reused row buffer) until the pair is
    * actually admitted — the steady-state reject path allocates nothing. */
  private def admit(buf: java.util.PriorityQueue[(UTF8String, Long)],
                    keyV: UTF8String, idV: Long, owned: Boolean): Unit = {
    if (buf.size < k) buf.add(((if (owned) keyV else keyV.clone()), idV))
    else {
      val worst = buf.peek()
      val c = keyV.binaryCompare(worst._1)
      if (c < 0 || (c == 0 && idV < worst._2)) {
        buf.poll()
        buf.add(((if (owned) keyV else keyV.clone()), idV))
      }
    }
  }

  override def update(buf: java.util.PriorityQueue[(UTF8String, Long)],
                      input: InternalRow): java.util.PriorityQueue[(UTF8String, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    // a null digest or id has no place in a deterministic order — skip,
    // mirroring how SQL ORDER BY ... LIMIT k with NULLS LAST never picks it
    if (kv != null && iv != null) {
      admit(buf, kv.asInstanceOf[UTF8String], iv.asInstanceOf[Long], owned = false)
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[(UTF8String, Long)],
                     b: java.util.PriorityQueue[(UTF8String, Long)]): java.util.PriorityQueue[(UTF8String, Long)] = {
    val it = b.iterator()
    while (it.hasNext) {
      val (s, v) = it.next()
      admit(a, s, v, owned = true) // b's entries were copied on admission
    }
    a
  }

  override def eval(buf: java.util.PriorityQueue[(UTF8String, Long)]): Any = {
    val arr = new java.util.ArrayList[(UTF8String, Long)](buf)
    // ascending output order = reverse of the max-heap comparator
    arr.sort(maxFirst.reversed())
    val out = new Array[Any](arr.size)
    var i = 0
    while (i < arr.size) {
      val (s, v) = arr.get(i)
      out(i) = new GenericInternalRow(Array[Any](s, v))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[(UTF8String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, v) = it.next()
      val kb = s.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(UTF8String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      q.add((UTF8String.fromBytes(kb), bb.getLong))
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
  /** Descending (key, id) order in UTF-8 binary key comparison: heap head
    * = worst admitted pair. */
  object MaxFirst extends java.util.Comparator[(UTF8String, Long)] with Serializable {
    override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
      val c = b._1.binaryCompare(a._1)
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
