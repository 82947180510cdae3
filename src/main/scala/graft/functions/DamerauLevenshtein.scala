package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE Damerau-Levenshtein distance (Lowrance-Wagner: edits may continue
  * around a transposition — "ca"→"abc" is 2, where the restricted OSA
  * variant says 3) as a native binary expression. Spark ships levenshtein
  * only; DuckDB's damerau_levenshtein implements THIS unrestricted
  * variant (probed: ca/abc=2, ab/ba=1, abc/acb=1), which is what makes it
  * oracle-bindable. Completes the edit-verifier family: levenshtein
  * (fuzzyEditDedup) < DL (transposition-aware — typo-heavy sources) <
  * Jaro-Winkler (prefix-weighted).
  *
  * Same codegen discipline as JaroWinkler: one helper call per row via
  * addReferenceObj so the verify stage stays inside WholeStageCodegen.
  * Codepoint-based, case-sensitive. O(|a|·|b|) time and memory per pair —
  * the blocking join must confine candidates BEFORE this runs (the
  * prefixFilterJoin contract).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType

  def compute(a: UTF8String, b: UTF8String): Int =
    DamerauLevenshtein.distance(a.toString, b.toString)

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("damerauLev", this, classOf[DamerauLevenshtein].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Column-API entry point. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))

  /** Unrestricted DL over codepoints (Lowrance-Wagner last-occurrence DP). */
  def distance(sa: String, sb: String): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // H is (la+2) x (lb+2) with the Lowrance-Wagner sentinel border
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= la) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da.getOrDefault(b(j - 1), 0)
        val j1 = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val trans = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        h(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    h(la + 1)(lb + 1)
  }
}
