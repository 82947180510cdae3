package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine n-gram language-model quality scoring (the CCNet-style
  * signal: score each document by how surprising its text is under a
  * model of the corpus itself; low-quality/boilerplate text scores at the
  * extremes). A KenLM-style external model is an opaque binary; training
  * the bigram LM in-engine keeps the whole signal a deterministic,
  * oracle-checkable dataflow.
  *
  * Plan shape: two counting aggregations build the model (unigram and
  * bigram tables — corpus-sized, so they stay DISTRIBUTED; only the
  * 1-row vocabulary size broadcasts), then each document's bigram
  * instances join their counts back and re-aggregate per document.
  * Every shuffle keys on a token/ngram/doc id. The unigram join's hot
  * keys ("the") are classic AQE-skew-split territory; the bigram join is
  * finer-grained. Per-instance log-probs are rounded then accumulated as
  * exact DECIMAL so the per-doc sum is order-independent (SURVEY §3).
  */
object LangModel {

  /** Per-document average negative log-likelihood under an add-k-smoothed
    * bigram model trained on the corpus itself:
    * P(w2|w1) = (C(w1 w2) + k) / (C(w1) + k·V). Documents with fewer than
    * two tokens have no bigrams: n_bigrams = 0, null score.
    */
  def bigramScore(docs: DataFrame, id: Column, text: Column, k: Double = 1.0): DataFrame =
    ngramScore(docs, id, text, 2, k).withColumnRenamed("n_ngrams", "n_bigrams")

  /** General order-n version: P(wₙ | w₁..wₙ₋₁) with add-k smoothing over
    * the unigram vocabulary. Contexts are counted as (n−1)-gram INSTANCES
    * (for n = 2 that is exactly the token counts), so the whole model is
    * two counting aggregations at any order; higher n only grows the
    * distinct-ngram tables, not the number of passes. Documents with
    * fewer than n tokens have no ngrams: n_ngrams = 0, null score.
    */
  def ngramScore(docs: DataFrame, id: Column, text: Column, n: Int, k: Double = 1.0): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    // the corpus is scanned and shingled twice (model build + scoring join)
    // — the same deliberate 2x-scan-CPU-vs-corpus-sized-storage trade as
    // Curation.curationStages; each pass uses the fused single-pass ngram
    // expression, not the ~20x interpreted HOF formulation (SURVEY §3).
    // In-corpus scoring never hits the unseen-count fallback (every ngram
    // of the scored docs is in the model by construction), so this is
    // byte-identical to the pre-model-split formulation.
    val (ng, ctx, voc) = trainNgramModel(base, col("text"), n)
    scoreAgainstModel(base, col("doc_id"), col("text"), n, ng, ctx, voc, k)
  }

  /** The three distributed model tables for an order-n LM: ngram counts,
    * context ((n-1)-gram instance) counts, and the unigram vocabulary
    * size. These ARE the trained model — persist them (parquet, keyed on
    * the ngram/context string) and daily batches score against them via
    * `scoreAgainstModel` without ever re-counting the archive: the LM twin
    * of the dedup band-key index.
    */
  def trainNgramModel(docs: DataFrame, text: Column, n: Int): (DataFrame, DataFrame, DataFrame) = {
    require(n >= 2, "ngram model needs order >= 2")
    val base = docs.select(text.as("text"))
    val ctxCounts = base.select(
        explode(graft.functions.ShingleExpressions.wordNgrams(col("text"), n - 1)).as("ctx"))
      .groupBy(col("ctx")).agg(count(lit(1)).as("cctx"))
    val vocab = base
      .select(explode(TextFeatures.words(col("text"))).as("w")).distinct()
      .agg(count(lit(1)).as("v"))
    val ngCounts = base.select(
        explode(graft.functions.ShingleExpressions.wordNgrams(col("text"), n)).as("ng"))
      .groupBy(col("ng")).agg(count(lit(1)).as("cng"))
    (ngCounts, ctxCounts, vocab)
  }

  /** Scores documents against a PREBUILT model (see `trainNgramModel`).
    * Ngrams/contexts the model has never seen count as zero before
    * smoothing — P = k/(cctx + kV) with cctx from the model, 0 if the
    * context itself is unseen — so out-of-domain text scores high-NLL
    * instead of erroring, which is exactly the filter semantics. The
    * joins key on the ngram/context string: model-sized relations, AQE
    * decides broadcast vs shuffle; the scored batch is typically the
    * small side.
    */
  def scoreAgainstModel(docs: DataFrame, id: Column, text: Column, n: Int,
                        ngCounts: DataFrame, ctxCounts: DataFrame, vocab: DataFrame,
                        k: Double = 1.0): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val ngrams = base.select(col("doc_id"),
      explode(graft.functions.ShingleExpressions.wordNgrams(col("text"), n)).as("ng"))
    val scored = ngrams
      .join(ngCounts, Seq("ng"), "left")
      .withColumn("ctx", substring_index(col("ng"), " ", n - 1))
      .join(ctxCounts, Seq("ctx"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        round6(-log((coalesce(col("cng"), lit(0L)) + lit(k))
          / (coalesce(col("cctx"), lit(0L)) + lit(k) * col("v"))))
          .cast(DecimalType(18, 6)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("nll")).as("nll_sum"))
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        round6(col("nll_sum").cast("double") /
          when(col("n_ngrams") > 0, col("n_ngrams").cast("double"))).as("lm_nll"))
  }

  /** CCNet-style perplexity bucketing: every document is assigned to its
    * slice's `head` / `middle` / `tail` by the slice's OWN score
    * distribution (cut at the 0.3 / 0.7 exact percentiles). Per-slice
    * calibration is the point — a "hard" language or source has a
    * different absolute perplexity range, but its relative tail is still
    * its worst 30%. Unscored documents (too short for an n-gram) bucket as
    * `unscored`.
    *
    * Scale shape: the cutpoints are ONE exact-percentile aggregation
    * (slice-count output rows, broadcast back); assignment is two
    * comparisons per row. No percent_rank — that would sort each slice's
    * whole corpus slice in one partition. Cuts are rounded with the same
    * portable floor arithmetic as the scores so the knife-edge comparison
    * is engine-independent.
    *
    * `scored`: (doc_id, slice, score) — compose with `bigramScore` /
    * `ngramScore` (or any quality signal) upstream.
    */
  def perplexityBuckets(scored: DataFrame, id: Column, slice: Column,
                        score: Column): DataFrame = {
    val base = scored.select(id.as("doc_id"), slice.as("slice"), score.as("score"))
    base.join(broadcast(scoreCuts(base, col("slice"), col("score"))), Seq("slice"), "left")
      .select(col("doc_id"), col("slice"), col("score"),
        bucketOf(col("score"), col("__c1"), col("__c2")).as("bucket"))
  }

  /** Per-slice 0.3/0.7 cutpoints as a tiny `(slice, __c1, __c2)` frame —
    * the TRAINED calibration artifact. Persist it and apply to later
    * batches or a live stream via `bucketOf` + a (stream-)static join:
    * calibration is computed offline on the archive, applied online
    * per row. Cuts are rounded with the portable floor arithmetic so the
    * knife-edge comparison is engine-independent.
    */
  def scoreCuts(scored: DataFrame, slice: Column, score: Column): DataFrame =
    scored.select(slice.as("slice"), score.as("score"))
      .filter(col("score").isNotNull)
      .groupBy(col("slice"))
      .agg(expr("percentile(score, array(0.3D, 0.7D))").as("__c"))
      .select(col("slice"),
        round6(element_at(col("__c"), 1)).as("__c1"),
        round6(element_at(col("__c"), 2)).as("__c2"))

  /** Row-local bucket decision against precomputed cuts. A null score
    * buckets as `unscored`; a scored row whose slice has NO cuts row (a
    * slice unseen at calibration time) falls through to `tail` — the
    * most-suspect bucket, the safe default for unknown provenance. */
  def bucketOf(score: Column, c1: Column, c2: Column): Column =
    when(score.isNull, lit("unscored"))
      .when(score <= c1, lit("head"))
      .when(score <= c2, lit("middle"))
      .otherwise(lit("tail"))

  /** The shared portable rounding contract (see graft.util.Portable). */
  private def round6(x: Column): Column = graft.util.Portable.round6(x)
}
