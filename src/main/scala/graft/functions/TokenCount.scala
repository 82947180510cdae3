package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token counter: number of maximal runs of ASCII [a-z0-9].
  *
  * Identical semantics to `size(regexp_extract_all(text, '[a-z0-9]+'))` but
  * a single byte scan with no regex engine and no intermediate array —
  * the hot-path shape for 100 TB token accounting. Stays inside
  * whole-stage codegen via doGenCode.
  */
case class TokenCount(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var n = 0L
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok && !inTok) n += 1
      inTok = isTok
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val inTok = ctx.freshName("inTok")
      val b = ctx.freshName("b")
      val isTok = ctx.freshName("isTok")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}_n = 0L;
         |boolean $inTok = false;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  boolean $isTok = ($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9');
         |  if ($isTok && !$inTok) ${ev.value}_n++;
         |  $inTok = $isTok;
         |}
         |${ev.value} = ${ev.value}_n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount = copy(newChild)
}

object TokenCount {
  /** Column-API entry point. */
  def tokenCount(c: Column): Column = Bridge.column(TokenCount(Bridge.expression(c)))
}
