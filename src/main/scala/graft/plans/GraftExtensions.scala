package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.dedup.Dedup
import graft.functions.{BottomKFingerprintExpr, DistinctShingles, DotProduct, HammingDistance,
  MinHashSig, SimHashExpr, TokenCount, TopTokenCount}

/** Rewrites comparisons against the nanosecond-normalized timestamp
  * (`timestamp_micros(raw div 1000)`) into raw-long bounds, so the predicate
  * reaches the parquet scan as a plain long comparison (PushedFilters) and
  * row groups prune.
  *
  * Floor semantics (µs = floor(ns/1000), non-negative domain):
  *   µs >  T  ⇔ ns >  T*1000 + 999
  *   µs >= T  ⇔ ns >= T*1000
  *   µs <  T  ⇔ ns <  T*1000
  *   µs <= T  ⇔ ns <= T*1000 + 999
  *   µs =  T  ⇔ T*1000 <= ns <= T*1000 + 999
  */
object NanoTimestampFilterRewrite extends Rule[LogicalPlan] {

  private object NanoConv {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(1000L, LongType), _)) => Some(raw)
      case _ => None
    }
  }

  private object TsLit {
    // v >= 1 keeps the rewrite exact even for negative raw nanos: `div`
    // truncates toward zero (not floor), so pre-epoch rows evaluate to
    // µs <= 0 on both the original and rewritten predicate when v >= 1.
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) if v >= 1 && v < Long.MaxValue / 1000 - 1000 => Some(v)
      case _ => None
    }
  }

  private def nanos(v: Long): Literal = Literal(v * 1000L, LongType)
  private def nanosHi(v: Long): Literal = Literal(v * 1000L + 999L, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThan(NanoConv(raw), TsLit(v)) => GreaterThan(raw, nanosHi(v))
    case GreaterThanOrEqual(NanoConv(raw), TsLit(v)) => GreaterThanOrEqual(raw, nanos(v))
    case LessThan(NanoConv(raw), TsLit(v)) => LessThan(raw, nanos(v))
    case LessThanOrEqual(NanoConv(raw), TsLit(v)) => LessThanOrEqual(raw, nanosHi(v))
    // EqualTo duplicates `raw` into two comparisons — only safe when a
    // second evaluation yields the same value (Spark's own rewrites guard
    // duplication the same way)
    case EqualTo(NanoConv(raw), TsLit(v)) if raw.deterministic =>
      And(GreaterThanOrEqual(raw, nanos(v)), LessThanOrEqual(raw, nanosHi(v)))
    case GreaterThan(TsLit(v), NanoConv(raw)) => LessThan(raw, nanos(v))
    case GreaterThanOrEqual(TsLit(v), NanoConv(raw)) => LessThanOrEqual(raw, nanosHi(v))
    case LessThan(TsLit(v), NanoConv(raw)) => GreaterThan(raw, nanosHi(v))
    case LessThanOrEqual(TsLit(v), NanoConv(raw)) => GreaterThanOrEqual(raw, nanos(v))
    case EqualTo(TsLit(v), NanoConv(raw)) if raw.deterministic =>
      And(GreaterThanOrEqual(raw, nanos(v)), LessThanOrEqual(raw, nanosHi(v)))
  }
}

/** Session extensions: the pushdown rule above, plus SQL registration of the
  * custom expressions so `spark.sql` users get the same surface as the
  * Column API (token_count, distinct_shingles, minhash_sig,
  * bottomk_fingerprint).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Explicit signature errors: a builder that falls through a `match` throws
    * an opaque MatchError, and silently ignoring extra arguments (e.g.
    * minhash_sig(text, 8) running with the default perms) is worse. */
  private def bad(sig: String, args: Seq[Expression]): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" ->
        s"expected $sig, got ${args.length} argument(s); size parameters must be integer literals"))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => NanoTimestampFilterRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => DeferredSummaryStrategy)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("token_count"),
      new ExpressionInfo("graft.functions.TokenCount", "token_count"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => TokenCount(t)
        case other => bad("token_count(text)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo("graft.functions.JaroWinkler", "jaro_winkler"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.JaroWinkler(a, b)
        case other => bad("jaro_winkler(a, b)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo("graft.functions.DamerauLevenshtein", "damerau_levenshtein"),
      (args: Seq[Expression]) => args match {
        // 3-arg form: threshold-BOUNDED variant (exact at dist <= k,
        // pinned to k+1 above — the linkage-verifier contract), mirroring
        // Spark's own levenshtein(l, r, threshold) SQL shape
        case Seq(a, b) => graft.functions.DamerauLevenshtein(a, b)
        case Seq(a, b, Literal(k: Int, _)) if k >= 0 =>
          graft.functions.BoundedDamerauLevenshtein(a, b, k)
        case other => bad("damerau_levenshtein(a, b[, maxDist >= 0])", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo("graft.functions.DeflateRatio", "deflate_ratio"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => graft.functions.DeflateRatio(t)
        case other => bad("deflate_ratio(text)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("distinct_shingles"),
      new ExpressionInfo("graft.functions.DistinctShingles", "distinct_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(t, Literal(n: Int, _)) if n >= 1 => DistinctShingles(t, n)
        case Seq(t) => DistinctShingles(t, 3)
        case other => bad("distinct_shingles(text[, n >= 1])", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new ExpressionInfo("graft.functions.MinHashSig", "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MinHashSig(t, 3, Dedup.minhashA, Dedup.minhashB, Dedup.minhashPrime)
        case other => bad("minhash_sig(text)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bottomk_fingerprint"),
      new ExpressionInfo("graft.functions.BottomKFingerprintExpr", "bottomk_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(t, Literal(n: Int, _), Literal(k: Int, _)) if n >= 1 && k >= 1 =>
          BottomKFingerprintExpr(t, n, k)
        case Seq(t) => BottomKFingerprintExpr(t, 3, 4)
        // k = 0 would fingerprint every doc to "" and collapse the corpus
        // into one false dup group; n = 0 would throw per row mid-job
        case other => bad("bottomk_fingerprint(text[, n >= 1, k >= 1])", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash32"),
      new ExpressionInfo("graft.functions.SimHashExpr", "simhash32"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashExpr(t, 32)
        case other => bad("simhash32(text)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft.functions.SimHashExpr", "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashExpr(t, 64)
        case other => bad("simhash64(text)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hamming_distance"),
      new ExpressionInfo("graft.functions.HammingDistance", "hamming_distance"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => HammingDistance(a, b)
        case other => bad("hamming_distance(a, b)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("top_token_count"),
      new ExpressionInfo("graft.functions.TopTokenCount", "top_token_count"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => TopTokenCount(t)
        case other => bad("top_token_count(text)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new ExpressionInfo("graft.functions.DotProduct", "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case other => bad("dot_product(a, b)", other)
      }))
    // sketch aggregates: the analyzer wraps a returned AggregateFunction in
    // its AggregateExpression, so SQL GROUP BY gets the same bounded-state
    // surface as the Column API
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo("graft.functions.HeavyHittersMG", "heavy_hitters"),
      (args: Seq[Expression]) => args match {
        case Seq(v, Literal(cap: Int, _), Literal(k: Int, _)) if cap >= 1 && k >= 1 && k <= cap =>
          graft.functions.HeavyHittersMG(v, cap, k)
        case other => bad("heavy_hitters(value, capacity >= 1, 1 <= k <= capacity)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("quantile_sketch"),
      new ExpressionInfo("graft.functions.QuantileSketchBHT", "quantile_sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(v, Literal(cap: Int, _), qs @ _*)
            if cap >= 2 && qs.nonEmpty &&
              qs.forall { case Literal(q: Int, _) => q >= 0 && q <= 1000; case _ => false } =>
          graft.functions.QuantileSketchBHT(v, cap,
            qs.map { case Literal(q: Int, _) => q })
        case other =>
          bad("quantile_sketch(value, capacity >= 2, q_permille...in [0,1000])", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("theta_sketch"),
      new ExpressionInfo("graft.functions.ThetaSketchBuild", "theta_sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => graft.functions.ThetaSketchBuild(v, 4096)
        case Seq(v, Literal(n: Int, _)) if n >= 16 && (n & (n - 1)) == 0 =>
          graft.functions.ThetaSketchBuild(v, n)
        case other => bad("theta_sketch(value[, nominalEntries power-of-2 >= 16])", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("theta_union"),
      new ExpressionInfo("graft.functions.ThetaSketchUnionAgg", "theta_union"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.functions.ThetaSketchUnionAgg(s, 4096)
        case Seq(s, Literal(n: Int, _)) if n >= 16 && (n & (n - 1)) == 0 =>
          graft.functions.ThetaSketchUnionAgg(s, n)
        case other => bad("theta_union(sketch[, nominalEntries power-of-2 >= 16])", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("theta_estimate"),
      new ExpressionInfo("graft.functions.ThetaEstimate", "theta_estimate"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.functions.ThetaEstimate(s)
        case other => bad("theta_estimate(sketch)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("theta_intersect"),
      new ExpressionInfo("graft.functions.ThetaIntersectEstimate", "theta_intersect"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.ThetaIntersectEstimate(a, b)
        case other => bad("theta_intersect(sketch_a, sketch_b)", other)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("theta_difference"),
      new ExpressionInfo("graft.functions.ThetaDifferenceEstimate", "theta_difference"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.ThetaDifferenceEstimate(a, b)
        case other => bad("theta_difference(sketch_a, sketch_b)", other)
      }))
  }
}
