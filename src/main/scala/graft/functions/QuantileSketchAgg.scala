package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Streaming-histogram quantile summary: the bounded-state scale path for
  * per-group quantiles when the group is too large to sort (the sketch
  * sibling of `HeavyHittersMG` — frequency there, rank here).
  *
  * Exact quantiles (`percentile`, the `value_quantiles` row) buffer every
  * group value on the reduce side — at 100 TB a corpus-sized group makes
  * that state as big as the problem. This aggregate keeps at most
  * `capacity` (value, weight) centroids per partial buffer (the
  * Ben-Haim & Tom-Tov streaming-histogram design, the one behind
  * decision-tree split finding): when a buffer overflows, the two closest
  * centroids merge into their weighted mean. Memory and shuffle volume are
  * fixed by the caller regardless of group size.
  *
  * Regimes (mirroring the heavy-hitters contract):
  *   - `capacity` >= the group's DISTINCT value count: no centroid ever
  *     merges, anywhere, in any merge order — the summary holds the exact
  *     value->count table and every reported quantile is the exact
  *     nearest-rank (lower) quantile. Deterministic, oracle-checkable;
  *     the regime the `value_quantiles_sketch` query row pins.
  *   - beyond capacity: centroids are weighted means, quantiles are rank
  *     estimates. Accuracy is property-tested in QuantileSketchSpec (rank
  *     error on seeded uniform/skewed streams); merge order may perturb
  *     estimates within that tolerance, which is why the approximate
  *     regime belongs in monitoring paths, not the determinism-audited
  *     oracle surface.
  *
  * Probabilities arrive as PER-MILLE integers and ranks are computed in
  * pure integer arithmetic — rank = max(1, ceil(q‰·n/1000)) =
  * (q‰·n + 999) div 1000 — so the knife-edge "which rank is the p95 of
  * 20 rows" question has one engine-independent answer (an IEEE
  * 0.95·n detours through 18.999999999999996 territory; the oracle SQL
  * runs the identical integer formula).
  *
  * Output: array<double> of the requested quantiles (nearest centroid at
  * or above the target rank), null for an empty group. Nulls and NaNs are
  * ignored on input.
  */
case class QuantileSketchBHT(
    child: Expression,
    capacity: Int,
    qsPerMille: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Double, Long]] {
  require(capacity >= 2, s"quantileSketch needs capacity >= 2, got $capacity")
  require(qsPerMille.nonEmpty && qsPerMille.forall(q => q >= 0 && q <= 1000),
    s"per-mille probabilities must be in [0, 1000], got $qsPerMille")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Double, Long] =
    new java.util.TreeMap[java.lang.Double, Long]()

  override def update(buf: java.util.TreeMap[java.lang.Double, Long],
                      input: InternalRow): java.util.TreeMap[java.lang.Double, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) {
        // absent keys unbox to 0L; live weights are always >= 1
        buf.put(d, buf.get(d) + 1L)
        if (buf.size > capacity) compactOnce(buf)
      }
    }
    buf
  }

  /** Merge the two CLOSEST adjacent centroids (ties: the smaller pair) into
    * their weighted mean — one overflow admits exactly one merge. */
  private def compactOnce(buf: java.util.TreeMap[java.lang.Double, Long]): Unit = {
    var bestGap = Double.PositiveInfinity
    var bestLeft: java.lang.Double = null
    var prev: java.util.Map.Entry[java.lang.Double, Long] = null
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (prev != null) {
        val gap = e.getKey - prev.getKey
        if (gap < bestGap) { bestGap = gap; bestLeft = prev.getKey }
      }
      prev = e
    }
    val c1 = buf.remove(bestLeft)
    val right = buf.higherEntry(bestLeft)
    val c2 = buf.remove(right.getKey)
    val w = c1 + c2
    val mean = (bestLeft * c1 + right.getKey * c2) / w
    // the mean lies in (left, right), emptied by the two removals; the
    // additive put only matters if IEEE rounding lands exactly on a bound
    buf.put(mean, buf.get(mean) + w)
  }

  override def merge(a: java.util.TreeMap[java.lang.Double, Long],
                     b: java.util.TreeMap[java.lang.Double, Long]): java.util.TreeMap[java.lang.Double, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.put(e.getKey, a.get(e.getKey) + e.getValue)
    }
    while (a.size > capacity) compactOnce(a)
    a
  }

  override def eval(buf: java.util.TreeMap[java.lang.Double, Long]): Any = {
    if (buf.isEmpty) return null
    var n = 0L
    val vit = buf.values().iterator()
    while (vit.hasNext) n += vit.next()
    val out = new Array[Any](qsPerMille.length)
    var qi = 0
    while (qi < qsPerMille.length) {
      // integer ceil of q*n/1000, floored at rank 1 (q=0 -> the minimum)
      val rank = math.max(1L, (qsPerMille(qi).toLong * n + 999L) / 1000L)
      var cum = 0L
      var ans = buf.lastKey().doubleValue()
      val it = buf.entrySet().iterator()
      var found = false
      while (it.hasNext && !found) {
        val e = it.next()
        cum += e.getValue
        if (cum >= rank) { ans = e.getKey; found = true }
      }
      out(qi) = ans
      qi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Double, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Double, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      m.put(bb.getDouble, bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchBHT =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchBHT =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketchBHT =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {
  /** Aggregate Column: streaming-histogram quantiles of double column `c`
    * at the given per-mille probabilities, with at most `capacity`
    * centroids per partial buffer. */
  def quantiles(c: Column, capacity: Int, qsPerMille: Seq[Int]): Column =
    Bridge.column(QuantileSketchBHT(Bridge.expression(c), capacity, qsPerMille)
      .toAggregateExpression())
}
