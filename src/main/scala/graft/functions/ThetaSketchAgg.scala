package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta distinct-count sketches with SET OPERATIONS — the capability HLL
  * structurally lacks: HLL states union, but never intersect or subtract,
  * so "participants active in BOTH datasets / retained week-over-week /
  * lost since last cycle" forces a rescan of the raw corpus. A theta
  * sketch is a bounded uniform sample of the key's hash space, so
  * intersection and A-not-B are estimable directly FROM the persisted
  * sketch bytes — the overlap/retention dashboard reads sketches, not
  * data (the mergeable-summaries companion of `Engagement.distinctSketches`).
  *
  * Regimes (the family contract): below `nominalEntries` distinct keys the
  * sketch is in exact mode — estimates are exact counts and every set
  * operation is deterministic and partitioning-independent (the
  * spec-gated regime). Beyond it, relative error ~ 1/sqrt(nominalEntries)
  * per sketch (intersections compound), property-tested in
  * ThetaSketchSpec.
  *
  * State per group is <= ~8 * nominalEntries bytes regardless of corpus
  * size; updates and merges are map-side combinable like every sketch in
  * the family.
  */
case class ThetaSketchBuild(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {
  require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
    s"nominalEntries must be a power of two >= 16, got $nominalEntries")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.getBytes)
      case l: java.lang.Long => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult(false, null))
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchBuild =
    copy(child = newChildren.head)
}

/** Union of PERSISTED theta sketch bytes — the rollup path (day→month,
  * dataset→global) over sketches stored next to the data; never returns
  * to the raw keys. */
case class ThetaSketchUnionAgg(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with ExpectsInputTypes {
  require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
    s"nominalEntries must be a power of two >= 16, got $nominalEntries")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(CompactSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult(false, null)); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchUnionAgg =
    copy(child = newChildren.head)
}

/** Distinct-count estimate from theta sketch bytes. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  def compute(bytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("thetaEst", this, classOf[ThetaEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate = copy(newChild)
}

/** |A ∩ B| estimate from two theta sketch byte columns — the operation
  * HLL cannot perform. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  def compute(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(a)))
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
    i.getResult.getEstimate
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("thetaIx", this, classOf[ThetaIntersectEstimate].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** |A \ B| estimate from two theta sketch byte columns (churn: "in last
  * cycle but not this one"). */
case class ThetaDifferenceEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  def compute(a: Array[Byte], b: Array[Byte]): Double = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.wrapCompactSketch(Memory.wrap(a)))
    op.notB(Sketches.wrapCompactSketch(Memory.wrap(b)))
    op.getResult(true).getEstimate
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("thetaDiff", this, classOf[ThetaDifferenceEstimate].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ThetaDifferenceEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaSketchAgg {
  /** Aggregate Column: theta sketch bytes of the distinct values of `c`. */
  def thetaSketch(c: Column, nominalEntries: Int = 4096): Column =
    Bridge.column(ThetaSketchBuild(Bridge.expression(c), nominalEntries).toAggregateExpression())

  /** Aggregate Column: union of persisted sketch bytes (the rollup path). */
  def thetaUnion(c: Column, nominalEntries: Int = 4096): Column =
    Bridge.column(ThetaSketchUnionAgg(Bridge.expression(c), nominalEntries).toAggregateExpression())

  def thetaEstimate(c: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(c)))
  def thetaIntersect(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersectEstimate(Bridge.expression(a), Bridge.expression(b)))
  def thetaDifference(a: Column, b: Column): Column =
    Bridge.column(ThetaDifferenceEstimate(Bridge.expression(a), Bridge.expression(b)))
}
