package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Fused row-local PQ encoder: all m subspace code assignments in one
  * expression pass, with the (small, driver-held) codebook attached as a
  * reference object — no per-centroid row fan-out, no shuffle. The
  * join-based encode multiplies every corpus row by ksub candidate
  * centroids before aggregating the argmin back down; at ksub=256 that is
  * a 256x row blow-up on the biggest frame in the pipeline. This kernel
  * keeps encode embarrassingly parallel: one projection over the corpus,
  * codebook broadcast with the plan.
  *
  * Numerics are bit-identical to the join path (pinned in PqSpec): same
  * left-to-right subvector self-dot and cross-dot, same
  * (s2 - 2*dot) + c2 fold order, same Portable.round6 floor arithmetic,
  * same ascending-cid strict-less argmin (= lexicographic (dist, cid)
  * min). NULL vec, wrong length, or a NULL element yield NULL.
  *
  * `codebook(sub)(cid)(j)` may be jagged in cid (per-subspace counts can
  * differ after empty-cluster drops) but every centroid must have
  * dim/m components.
  */
case class PqEncodeCodes(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty), "empty PQ codebook")
  private val m = codebook.length
  private val dsub = codebook(0)(0).length
  require(codebook.forall(_.forall(_.length == dsub)),
    s"every PQ centroid must have $dsub components")

  // per-centroid self-dots, same left-to-right fold as DotProduct
  @transient private lazy val c2: Array[Array[Double]] = codebook.map(_.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  })

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // a raw Java array renders as its JVM identity ([[[D@hex) in plan
  // strings, which would churn the plan fingerprint on identical code —
  // render shape + a content hash instead (deepHashCode is value-based,
  // stable across JVMs)
  override def stringArgs: Iterator[Any] = Iterator(child,
    s"codebook(m=$m, dsub=$dsub, sizes=${codebook.map(_.length).mkString("/")}, " +
      s"h=${java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]]).toHexString})")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PqEncodeCodes expects array<double>, got $t")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() != m * dsub) return null
    var i = 0
    while (i < vec.numElements()) { if (vec.isNullAt(i)) return null; i += 1 }
    val out = PqEncodeCodes.encodeInto(vec, codebook, c2, m, dsub)
    new GenericArrayData(out.map(x => x: Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[][]")
    val i = ctx.freshName("i")
    val bad = ctx.freshName("bad")
    val out = ctx.freshName("out")
    nullSafeCodeGen(ctx, ev, vec => {
      s"""
         |boolean $bad = ($vec.numElements() != ${m * dsub});
         |if (!$bad) {
         |  for (int $i = 0; $i < $vec.numElements(); $i++) {
         |    if ($vec.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = graft.functions.PqEncodeCodes.encodeInto(
         |    $vec, $cbRef, $c2Ref, $m, $dsub);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

object PqEncodeCodes {
  /** Shared inner loop for eval and codegen — ONE implementation of the
    * distance/argmin arithmetic, so interpreted and generated paths cannot
    * drift. */
  def encodeInto(vec: ArrayData, cb: Array[Array[Array[Double]]],
                 c2: Array[Array[Double]], m: Int, dsub: Int): Array[Int] = {
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val off = sub * dsub
      var s2 = 0.0
      var j = 0
      while (j < dsub) { val x = vec.getDouble(off + j); s2 += x * x; j += 1 }
      val cents = cb(sub)
      var best = Double.PositiveInfinity
      var bestCid = -1
      var cid = 0
      while (cid < cents.length) {
        val c = cents(cid)
        var d = 0.0
        var t = 0
        while (t < dsub) { d += vec.getDouble(off + t) * c(t); t += 1 }
        val dist = graft.util.Portable.round6d((s2 - 2.0 * d) + c2(sub)(cid))
        if (dist < best) { best = dist; bestCid = cid }
        cid += 1
      }
      out(sub) = bestCid
      sub += 1
    }
    out
  }
}

object VectorExpressions {
  /** Fused sum of element products over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Fused PQ asymmetric-distance lookup: sum_s table[s][codes[s]]. */
  def adcLookupSum(codes: Column, table: Column): Column =
    Bridge.column(AdcLookupSum(Bridge.expression(codes), Bridge.expression(table)))

  /** Fused row-local PQ encode against a driver-held codebook. */
  def pqEncodeCodes(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncodeCodes(Bridge.expression(vec), codebook))
}
