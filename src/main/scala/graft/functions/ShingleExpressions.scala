package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle/sketch expressions.
  *
  * Spark's higher-order array functions (transform/aggregate) evaluate
  * interpreted — per-element closures with boxing, outside codegen. For the
  * dedup hot path (every document, every shingle, at 100 TB) that's the
  * bottleneck, so these expressions do the whole
  * split -> shingle -> md5 -> permute/min pipeline in one tight JVM loop per
  * row. Semantics are byte-for-byte the portable md5 formulation the DuckDB
  * oracle runs (see SparkEntry oracle SQL).
  */
object ShingleUtil {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Distinct word n-gram shingles, insertion order (order never observable:
    * consumers sort or take mins). Split mirrors split(text, ' ') with
    * limit -1 (trailing empties kept).
    */
  def distinctShingles(text: String, n: Int): Array[String] = {
    val words = text.split(" ", -1)
    if (words.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** ALL word n-gram instances in order, duplicates kept — the counting
    * twin of [[distinctShingles]] (LM training needs multiplicities).
    * Same split contract: split(text, ' ') with limit -1.
    */
  def wordNgrams(text: String, n: Int): Array[String] = {
    val words = text.split(" ", -1)
    if (words.length < n) return Array.empty
    val out = new Array[String](words.length - n + 1)
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Raw 16-byte md5 digest. */
  def md5Bytes(s: String): Array[Byte] =
    md5Local.get().digest(s.getBytes("UTF-8"))

  def md5Hex(s: String): String = {
    val d = md5Local.get().digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 32 bits of md5 as an unsigned long (== parsing the first 8 hex
    * chars, as the oracle does with ('0x' || substr(md5(s),1,8))::BIGINT).
    */
  def md5Base32(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** array<string> of distinct word n-gram shingles.
  *
  * All expressions in this file implement doGenCode as a single helper call
  * per row (via addReferenceObj): the work is string/digest-bound, so the
  * win is not inlining the loop but keeping the surrounding stage inside
  * whole-stage codegen — a CodegenFallback evicts the entire stage.
  */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val arr = ShingleUtil.distinctShingles(input.toString, n)
    new GenericArrayData(arr.map(x => UTF8String.fromString(x): Any))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("distinctShingles", this, classOf[DistinctShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): DistinctShingles = copy(newChild)
}

/** Single-pass non-distinct n-gram instance list (see
  * ShingleUtil.wordNgrams) — replaces the interpreted HOF formulation in
  * hot LM-training scans.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"ngram width must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val arr = ShingleUtil.wordNgrams(input.toString, n)
    new GenericArrayData(arr.map(x => UTF8String.fromString(x): Any))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordNgrams", this, classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): WordNgrams = copy(newChild)
}

/** array<long> minhash signature: for each permutation p,
  * min over distinct shingles of (md5base32(sh) * a(p) + b(p)) % prime.
  * Empty array when the document has no shingles.
  */
case class MinHashSig(child: Expression, n: Int, a: Seq[Long], b: Seq[Long], prime: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(a.length == b.length,
    s"minhash permutation tables must align: a=${a.length} b=${b.length}")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val numPerms = a.length
  // hot-loop arrays: the Seq parameters are Lists — indexing them inside
  // the per-shingle loop would walk cons cells O(numPerms^2) per shingle
  private val aArr = a.toArray
  private val bArr = b.toArray
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val sh = ShingleUtil.distinctShingles(input.toString, n)
    if (sh.isEmpty) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = ShingleUtil.md5Base32(sh(i))
      var p = 0
      while (p < numPerms) {
        val v = (h * aArr(p) + bArr(p)) % prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(newChild)
}

/** Bottom-k fingerprint: the k lexicographically-smallest md5 hex strings of
  * the distinct shingles, joined with ';'. "" when no shingles.
  */
case class BottomKFingerprintExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def compute(input: UTF8String): UTF8String = {
    val sh = ShingleUtil.distinctShingles(input.toString, n)
    // no shingles -> NULL, not "": an empty-string fingerprint would collapse
    // every short document into one giant false near-dup group
    if (sh.isEmpty) return null
    val hashes = new Array[String](sh.length)
    var i = 0
    while (i < sh.length) { hashes(i) = ShingleUtil.md5Hex(sh(i)); i += 1 }
    java.util.Arrays.sort(hashes.asInstanceOf[Array[AnyRef]])
    UTF8String.fromString(hashes.take(k).mkString(";"))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bottomK", this, classOf[BottomKFingerprintExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $self.compute($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): BottomKFingerprintExpr = copy(newChild)
}

/** Width-generic SimHash bit-vote over the raw md5 digest bytes.
  *
  * The hex formulation the oracle runs (hex digit at pos/4, bit (pos%4) by
  * integer division) reads exactly bit `7 - pos%8` of digest byte `pos/8` —
  * the digest's natural MSB-first bit order — so voting from the bytes is
  * byte-for-byte identical and skips the hex encode + per-char decode.
  */
private[functions] object SimHashUtil {
  def simhash(input: Any, width: Int): UTF8String = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](width)
    var i = 0
    while (i < words.length) {
      if (seen.add(words(i))) {
        val d = ShingleUtil.md5Bytes(words(i))
        var pos = 0
        while (pos < width) {
          val bit = (d(pos >> 3) >> (7 - (pos & 7))) & 1
          votes(pos) += bit * 2 - 1
          pos += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](width)
    var p = 0
    while (p < width) { out(p) = if (votes(p) > 0) '1' else '0'; p += 1 }
    UTF8String.fromBytes(out)
  }
}

/** SimHash as a '0'/'1' string at width 32 or 64 — the fused single-pass
  * form of the distinct-token md5 bit-vote (oracle formulation: per
  * distinct token, hex digit of md5 at pos/4, bit (pos%4) extracted by
  * integer division, votes +-1 summed per position, bit '1' iff sum > 0).
  * Width 64 is the production variant (see Dedup.simhashPairs note: twice
  * the band discrimination on low-diversity corpora); one class serves
  * both so the vote semantics cannot drift between widths.
  */
case class SimHashExpr(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width == 32 || width == 64, s"simhash width must be 32 or 64, got $width")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  def compute(input: UTF8String): UTF8String = SimHashUtil.simhash(input, width)
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhash", this, classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr = copy(child = newChild)
}

/** CHARACTER-level Hamming distance (unequal lengths add the length
  * difference) — one fused scan; the higher-order-function formulation
  * (split + zip_with + filter) is interpreted and dominates candidate-pair
  * verification at scale. ASCII inputs (the simhash bit strings this
  * serves) take a byte-scan fast path; any non-ASCII input falls back to
  * a char scan so the SQL-exposed function keeps per-character semantics
  * instead of silently counting UTF-8 continuation bytes.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  def compute(lu: UTF8String, ru: UTF8String): Long = {
    val a = lu.getBytes
    val b = ru.getBytes
    if (a.length == lu.numChars() && b.length == ru.numChars()) {
      // pure-ASCII fast path: bytes ARE the characters
      val n = math.min(a.length, b.length)
      var d = (a.length - b.length).abs.toLong
      var i = 0
      while (i < n) { if (a(i) != b(i)) d += 1; i += 1 }
      d
    } else {
      val as = lu.toString
      val bs = ru.toString
      val n = math.min(as.length, bs.length)
      var d = (as.length - bs.length).abs.toLong
      var i = 0
      while (i < n) { if (as.charAt(i) != bs.charAt(i)) d += 1; i += 1 }
      d
    }
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hamming", this, classOf[HammingDistance].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Occurrence count of the most frequent whitespace token — the numerator
  * of the "fraction of tokens that are the single most common token"
  * repetition filter (Gopher-style quality rule). One hash-count pass per
  * row; codegen'd like the rest of the family.
  */
case class TopTokenCount(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  def compute(input: UTF8String): Long = {
    val words = input.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int]()
    var best = 0
    var i = 0
    while (i < words.length) {
      // skip the empty tokens produced by consecutive/leading/trailing
      // spaces: whitespace runs must not become the "most frequent token"
      // (a Gopher-style dominant-token rule would otherwise drop
      // whitespace-irregular but legitimate documents)
      if (!words(i).isEmpty) {
        val c = counts.merge(words(i), 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("topTokenCount", this, classOf[TopTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): TopTokenCount = copy(newChild)
}

object ShingleExpressions {
  def distinctShingles(text: Column, n: Int): Column =
    Bridge.column(DistinctShingles(Bridge.expression(text), n))
  def wordNgrams(text: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(text), n))
  def minhashSig(text: Column, n: Int, a: Seq[Long], b: Seq[Long], prime: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), n, a, b, prime))
  def bottomKFingerprint(text: Column, n: Int, k: Int): Column =
    Bridge.column(BottomKFingerprintExpr(Bridge.expression(text), n, k))
  def hammingDistance(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expression(a), Bridge.expression(b)))
  def simhash32(text: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(text), 32))
  def simhash64(text: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(text), 64))
  def topTokenCount(text: Column): Column =
    Bridge.column(TopTokenCount(Bridge.expression(text)))
}
