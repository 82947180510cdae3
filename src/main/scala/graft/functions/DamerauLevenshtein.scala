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

/** Threshold-bounded DL: exact whenever the true distance is <= `maxDist`,
  * and any value STRICTLY GREATER than `maxDist` (pinned to maxDist + 1)
  * otherwise — the contract a `dl <= maxDist` verifier needs, at a fraction
  * of the full DP's cost. See [[DamerauLevenshtein.boundedDistance]] for
  * the band/early-abandon argument. A linkage filter that keeps
  * `bounded <= k` therefore returns EXACTLY the rows `full <= k` returns,
  * with the kept rows' `dl` values identical to the full DP's.
  */
case class BoundedDamerauLevenshtein(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(maxDist >= 0, s"BoundedDamerauLevenshtein needs maxDist >= 0, got $maxDist")
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType

  def compute(a: UTF8String, b: UTF8String): Int =
    DamerauLevenshtein.boundedDistance(a.toString, b.toString, maxDist)

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("boundedDamerauLev", this,
      classOf[BoundedDamerauLevenshtein].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedDamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Column-API entry point. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))

  /** Column-API entry point for the threshold-bounded variant. */
  def damerauLevenshteinBounded(a: Column, b: Column, maxDist: Int): Column =
    Bridge.column(BoundedDamerauLevenshtein(
      Bridge.expression(a), Bridge.expression(b), maxDist))

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

  /** Threshold-bounded unrestricted DL (Ukkonen-banded Lowrance-Wagner with
    * row-minimum early abandonment): returns the EXACT distance whenever it
    * is <= k, and k + 1 otherwise. Per-pair work drops from O(|a|·|b|) to
    * O(min(|a|,|b|) · k) — and typically far less on non-matching pairs,
    * which abandon as soon as a full row's minimum exceeds k. This is what
    * lets a blocked-linkage verifier at a small threshold (the
    * record_linkage_dl contract: k=8 over 64-char probes) scale with
    * candidate-pair volume instead of pair volume × 4096 DP cells.
    *
    * Why each guard is exact at the threshold:
    *  - length gate: every edit op changes |a|-|b| by at most 1
    *    (transpositions by 0), so DL >= ||a|-|b|| and ||a|-|b|| > k
    *    decides > k with no DP at all.
    *  - band |i-j| <= k: h(i)(j) >= |i-j| (same argument), so a path of
    *    total cost <= k only visits in-band cells — including every cell a
    *    transposition term h(i1)(j1) + (i-i1-1) + 1 + (j-j1-1) <= k can
    *    reference, because that inequality bounds |i1-j1| inside the band
    *    too. Out-of-band cells read as +inf; in-band values are therefore
    *    >= the unrestricted values and EQUAL along any <= k path.
    *  - row-min abandon: for every row r, some in-band cell of row r has
    *    (banded) value <= DL(a,b) when DL(a,b) <= k — either the optimal
    *    path's own cell in row r, or (when a transposition jumps rows
    *    i1 < r <= i) the deletion-chain cell h(r)(j1) <= h(i1)(j1) +
    *    (r - i1), which the transposition's gap cost keeps <= DL(a,b) and
    *    in-band. So a row whose banded minimum exceeds k proves DL > k.
    */
  def boundedDistance(sa: String, sb: String, k: Int): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > k) return k + 1
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // flat (la+2) x (lb+2) Lowrance-Wagner table, inf-initialized so the
    // out-of-band cells a transposition might reference read as inf
    val w = lb + 2
    val h = new Array[Int]((la + 2) * w)
    java.util.Arrays.fill(h, inf)
    var i = 0
    while (i <= la) { h((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(w + j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= la) {
      var db = 0
      var rowMin = inf
      // band: only columns with |i - j| <= k can sit on a <= k path
      val jLo = math.max(1, i - k)
      val jHi = math.min(lb, i + k)
      j = jLo
      while (j <= jHi) {
        val i1 = da.getOrDefault(b(j - 1), 0)
        val j1 = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val trans = h(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        val v = math.min(math.min(sub, ins), math.min(del, trans))
        h((i + 1) * w + j + 1) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return k + 1
      da.put(a(i - 1), i)
      i += 1
    }
    val d = h((la + 1) * w + lb + 1)
    if (d > k) k + 1 else d
  }
}
