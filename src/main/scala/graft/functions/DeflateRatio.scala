package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio (compressed bytes / raw UTF-8 bytes) — the
  * quality signal the ratio rules can't fake: machine-generated repetition
  * compresses toward 0 however it's templated, natural prose sits near
  * ~0.4-0.6, and high-entropy noise exceeds 1. The classic pre-filter in
  * web-corpus pipelines, complementing token_entropy (which sees token
  * DISTRIBUTION but not structural repetition across tokens).
  *
  * zlib level 6 with the default strategy, one Deflater per evaluation —
  * deterministic for a given input on the JVM (spec pins the monotonicity
  * contract and exact ratios on fixed strings; no SQL oracle exists, so
  * this is a spec-pinned expression, not an oracle-bound query). Empty
  * input reports NULL (no bytes to compress). r6-rounded.
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  def compute(input: UTF8String): Any = {
    val raw = input.getBytes
    if (raw.isEmpty) return null
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      math.floor(compressed.toDouble / raw.length.toDouble * 1e6 + 0.5) / 1e6
    } finally d.end()
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("deflateRatio", this, classOf[DeflateRatio].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object r = $self.compute($c);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio = copy(newChild)
}

object DeflateRatio {
  /** Column-API entry point. */
  def deflateRatio(c: Column): Column = Bridge.column(DeflateRatio(Bridge.expression(c)))
}
