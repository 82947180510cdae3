package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fixed-width Bloom bitset aggregate: ORs together per-row bit-position
  * arrays into one `numBits`-wide bitset, emitted as array<long> words
  * (little-endian within a word: bit p lives at word p/64, offset p%64).
  *
  * This is the membership half of a file-skipping index: the positions are
  * computed row-locally with codegen'd `xxhash64` expressions (see
  * `StatsManifest.bloomPositions`), so the aggregate itself only ORs —
  * state is exactly `numBits/8` bytes per partial buffer regardless of
  * input cardinality, and the merge is a word-wise OR, fully mergeable
  * under any partitioning. A membership probe then needs no aggregate at
  * all: test each probe position's bit with element_at + shiftright.
  *
  * NULL position arrays (NULL input values upstream) contribute no bits —
  * a Bloom index answers "might this file contain value v", and NULL is
  * not a value equality predicates can match.
  */
case class BloomBitset(
    positions: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(numBits >= 64 && numBits % 64 == 0,
    s"bloomBitset needs numBits >= 64 and divisible by 64, got $numBits")
  private val numWords = numBits / 64

  override def children: Seq[Expression] = Seq(positions)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = positions.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) {
          val p = a.getLong(i)
          require(p >= 0L && p < numBits, s"bit position $p out of [0, $numBits)")
          buf((p >> 6).toInt) |= (1L << (p & 63L))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(w => w: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numWords * 8)
    var i = 0
    while (i < numWords) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](numWords)
    var i = 0
    while (i < numWords) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitset =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitset =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBitset =
    copy(positions = newChildren.head)
}

object BloomBitsetAgg {
  /** Aggregate Column: OR the array<long> bit positions in `positions` into
    * one `numBits`-wide bitset, returned as array<long> words. */
  def bloomBitset(positions: Column, numBits: Int): Column =
    Bridge.column(BloomBitset(Bridge.expression(positions), numBits).toAggregateExpression())
}
