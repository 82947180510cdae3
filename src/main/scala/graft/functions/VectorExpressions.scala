package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fused vector kernels.
  *
  * Spark evaluates higher-order array functions (`aggregate(zip_with(...))`)
  * interpreted — a boxed closure call per element. For the ANN family every
  * candidate pair pays dim× that cost, which made brute-force top-k the
  * slowest non-asof query in round 1. This expression runs the whole dot
  * product as one primitive loop per row, and implements doGenCode so the
  * surrounding projection stays inside whole-stage codegen (a
  * CodegenFallback would evict the entire stage from codegen).
  *
  * Numerics match the HOF formulation exactly: left-to-right summation over
  * ascending indices — the same order DuckDB's list_dot_product uses, so
  * oracle parity is preserved bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DotProduct expects two array<double> arguments, got ${left.dataType} and ${right.dataType}")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // length mismatch or a null element -> null, mirroring zip_with/aggregate
    // (zip_with pads the shorter side with null; null * x = null; acc + null
    // propagates)
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      // mirrors eval(): length mismatch or null element -> null result
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance (ADC) kernel for product quantization: given a
  * row's code word (array<int>, one centroid id per subspace) and a
  * query's precomputed distance table (array<array<double>>, indexed
  * [subspace][centroid id]), returns sum_s table[s][codes[s]] — the PQ
  * approximation of the query-to-row distance.
  *
  * This is the inner loop of a PQ scan: m table lookups + adds per
  * candidate instead of a d-dimensional arithmetic pass (m << d), and the
  * reason PQ beats raw-vector scans at corpus scale. Fused and codegen'd
  * for the same reason as DotProduct — a HOF formulation would evaluate
  * interpreted per element and evict the stage from codegen.
  *
  * NULL semantics mirror DotProduct: null inputs, a subspace-count
  * mismatch, a null element, or an out-of-range code yield null (an
  * unencodable row must sort nowhere, not crash the scan).
  */
case class AdcLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"AdcLookupSum expects (array<int> codes, array<array<double>> table), " +
          s"got ${left.dataType} and ${right.dataType}")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val codes = l.asInstanceOf[ArrayData]
    val table = r.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (table.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || table.isNullAt(i)) return null
      val c = codes.getInt(i)
      val dv = table.getArray(i)
      if (c < 0 || c >= dv.numElements() || dv.isNullAt(c)) return null
      acc += dv.getDouble(c)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val dv = ctx.freshName("dv")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $codes.numElements();
         |if ($table.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($codes.isNullAt($i) || $table.isNullAt($i)) { $bad = true; break; }
         |    int $c = $codes.getInt($i);
         |    org.apache.spark.sql.catalyst.util.ArrayData $dv = $table.getArray($i);
         |    if ($c < 0 || $c >= $dv.numElements() || $dv.isNullAt($c)) { $bad = true; break; }
         |    $acc += $dv.getDouble($c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Fused sum of element products over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Fused PQ asymmetric-distance lookup: sum_s table[s][codes[s]]. */
  def adcLookupSum(codes: Column, table: Column): Column =
    Bridge.column(AdcLookupSum(Bridge.expression(codes), Bridge.expression(table)))
}
