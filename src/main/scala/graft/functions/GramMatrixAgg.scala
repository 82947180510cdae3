package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** One-pass Gram/covariance moments of an embedding column at bounded
  * state — the whitening / PCA / quantizer-calibration workhorse.
  *
  * The naive plan (posexplode² + self-join on the row id, or a d²-wide
  * explode per row) fans every vector out d(+1)/2 times before the
  * aggregation; at 100 TB of embeddings that multiplies the shuffle by the
  * dimension. This aggregate folds each vector into a fixed
  * 1 + d + d(d+1)/2 longs buffer (n, per-dim sums, upper-triangle product
  * sums) — ~17 KB at d=64 — merged map-side; the corpus is scanned once and
  * never fanned out.
  *
  * All sums are EXACT integer arithmetic over 6-decimal-quantized values
  * (`floor(x·1e6 + 0.5)` per element / per product, summed as long): the
  * result is merge-order independent bit-for-bit, and any SQL engine can
  * replay it with the same floor expression — the embedding_dim_stats
  * DECIMAL discipline, moved inside the buffer. Overflow headroom: unit-ish
  * coordinates quantize to ~1e6, so ~9e18/1e6 ≈ 9e12 rows per (i,j) cell
  * before a long saturates.
  *
  * Output: array<struct<i:int, j:int (i<=j), n:long, sp:long, si:long,
  * sj:long>> — everything covariance needs per pair, one explode, no
  * joins. Rows with a null vector are skipped; a vector of the wrong
  * length fails loudly (silently dropping it would diverge from any
  * oracle's count).
  */
case class GramMoments(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(d >= 1, s"gramMoments needs d >= 1, got $d")

  private val nTri = d * (d + 1) / 2
  private val bufLen = 1 + d + nTri

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  // element type resolved at ANALYSIS time: float and double vectors both
  // read through their own accessor; anything else fails loudly (reading a
  // double array through getFloat would silently return garbage)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gramMoments expects array<float> or array<double>, got $other")
    }

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sp", LongType, nullable = false),
      StructField("si", LongType, nullable = false),
      StructField("sj", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  private def q6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gramMoments(d=$d) got a vector of length ${arr.numElements()}")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        // a null ELEMENT would read as garbage through the typed accessor
        // and silently poison every moment — fail loudly like a ragged
        // vector
        require(!arr.isNullAt(i), s"gramMoments: null element at index $i")
        x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf(0) += 1L
      var k = 1 + d
      i = 0
      while (i < d) {
        buf(1 + i) += q6(x(i))
        var j = i
        while (j < d) {
          buf(k) += q6(x(i) * x(j))
          j += 1
          k += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](nTri)
    val n = buf(0)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = new GenericInternalRow(
          Array[Any](i, j, n, buf(1 + d + k), buf(1 + i), buf(1 + j)))
        j += 1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMoments =
    copy(child = newChildren.head)
}

object GramMatrixAgg {
  /** Aggregate Column: exact quantized second-moment table of a
    * d-dimensional float-vector column (upper triangle, one struct per
    * (i,j) pair). */
  def gramMoments(vec: Column, d: Int): Column =
    Bridge.column(GramMoments(Bridge.expression(vec), d).toAggregateExpression())
}
