package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * shingling, stopword statistics, quality scoring, and a heuristic
  * language-ID. All pure `functions._` column expressions — codegen'd,
  * shuffle-free, and dialect-portable for the oracle (SURVEY.md §3).
  */
object TextFeatures {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (space-joined). Empty array when fewer than n
    * words.
    */
  def shingles(text: Column, n: Int): Column = {
    // let-bind the split once (single-element transform): referencing
    // words(text) inside the per-shingle lambda re-tokenizes the document
    // n times per shingle — lambda bodies re-evaluate captured
    // subexpressions per element (the wordChunks lesson)
    element_at(
      transform(array(words(text)), w =>
        when(size(w) >= n,
          transform(sequence(lit(0), size(w) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j + 1))): _*)))
          .otherwise(array().cast("array<string>"))),
      1)
  }

  /** Number of tokens contained in `stopwords`. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(words(text), x => x.isInCollection(stopwords))).cast("long")

  /** Regex token count (letter or digit runs) via built-in regexp machinery;
    * graft.functions.TokenCount is the codegen'd fast path with identical
    * semantics.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z0-9]+"), lit(0))).cast("long")

  /** English-ish stopword list shared with the oracle side. */
  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val esStopwords: Seq[String] = Seq("el", "la", "de", "y", "que", "en", "un")
  val frStopwords: Seq[String] = Seq("le", "la", "de", "et", "que", "en", "un")
  val deStopwords: Seq[String] = Seq("der", "die", "das", "und", "zu", "in", "ist")

  /** Quality metrics: word count, char count, average word length, stopword
    * ratio, punctuation count, and a deterministic composite score.
    * Mirrors the length/punct/stopword-ratio heuristics used for LLM
    * training-data filtering.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val nWords = size(words(text)).cast("long")
    val nChars = length(text).cast("long")
    val punct = length(regexp_replace(text, "[^.!?,;]", "")).cast("long")
    val stops = stopwordHits(text, enStopwords)
    val avgWordLen = nChars.cast("double") / nWords.cast("double")
    val stopRatio = stops.cast("double") / nWords.cast("double")
    // Portable.round6, not engine round(): these rounded doubles are
    // oracle-hashed, and engine round() disagrees across dialects on
    // half-way quotients (the LM-score lesson, applied family-wide)
    val r6 = graft.util.Portable.round6 _
    val score = r6(
      lit(1.0)
        - when(avgWordLen < 3.0 || avgWordLen > 10.0, 0.3).otherwise(0.0)
        - when(stopRatio < 0.01, 0.2).otherwise(0.0)
        - when(nWords < 10, 0.5).otherwise(0.0))
    Seq(
      nWords.as("n_words"), nChars.as("n_chars_m"), punct.as("n_punct"),
      stops.as("n_stopwords"),
      r6(avgWordLen).as("avg_word_len"),
      r6(stopRatio).as("stopword_ratio"),
      score.as("quality_score"))
  }

  /** Gopher-style quality-filter DECISION: the first failing rule names the
    * drop reason, 'kept' when all pass. Rules: minimum length, word-length
    * band, stopword floor, within-doc n-gram repetition cap, dominant-token
    * cap. All row-local (fused expressions), so the filter pass is a pure
    * map over the corpus — the shape a 100 TB curation sweep needs.
    * Divisions are safe: split() yields at least one element, so n_words
    * is never zero.
    */
  def filterDecision(text: Column): Column = {
    import graft.functions.ShingleExpressions
    val nWords = size(words(text)).cast("long")
    val avgWordLen = length(text).cast("double") / nWords.cast("double")
    val stopRatio = stopwordHits(text, enStopwords).cast("double") / nWords.cast("double")
    val nTotal = nWords - 2
    val nDistinct = size(ShingleExpressions.distinctShingles(text, 3)).cast("long")
    val dupFrac = when(nTotal > 0,
      lit(1.0) - nDistinct.cast("double") / nTotal.cast("double")).otherwise(lit(0.0))
    // denominator matches the numerator's token definition (TopTokenCount
    // skips the empty tokens whitespace runs produce): irregular spacing
    // must neither trigger nor dilute the dominant-token rule
    val nRealWords = size(filter(words(text), w => length(w) > 0)).cast("long")
    val topFrac =
      ShingleExpressions.topTokenCount(text).cast("double") / nRealWords.cast("double")
    when(nWords < 10, "too_short")
      .when(avgWordLen < 3.0 || avgWordLen > 10.0, "word_length")
      .when(stopRatio < 0.01, "no_stopwords")
      .when(dupFrac > 0.3, "repetitive_ngrams")
      .when(topFrac > 0.2, "dominant_token")
      .otherwise("kept")
  }

  /** Three-voter ensemble consensus (the Snorkel-style weak-supervision
    * vote): a 2-of-3 agreement between the b/c voters overrides the
    * declared label `a`; any split with `a` on the winning side, or an
    * all-distinct vote, keeps `a` (the declared voter is the prior).
    * Returns (consensus, n_agree 1..3) — row-local, null comparisons fall
    * through to the prior on both engines identically.
    */
  def consensusVote(a: Column, b: Column, c: Column): Seq[Column] = Seq(
    when(b === c && a =!= b, b).otherwise(a).as("consensus"),
    when(a === b && a === c, 3)
      .when(a === b || a === c || b === c, 2)
      .otherwise(1).as("n_agree"))

  /** Heuristic language-ID: stopword-hit score per language, argmax with a
    * fixed language priority for ties. Deterministic by construction.
    */
  def langIdColumns(text: Column): Seq[Column] =
    langIdProfiled(text, Seq("en" -> enStopwords, "es" -> esStopwords,
      "fr" -> frStopwords, "de" -> deStopwords))

  /** Language profiles as DATA, not code: (code, stopword table) in tie-
    * break priority order. The default table covers the languages a
    * cross-African engagement corpus actually mixes (reference pipelines
    * run in Somali/Swahili/English markets) plus the major European ones.
    * Callers supply their own table for other domains — the scoring
    * scaffolding is profile-agnostic.
    */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> enStopwords,
    "es" -> esStopwords,
    "fr" -> frStopwords,
    "de" -> deStopwords,
    "pt" -> Seq("o", "a", "de", "e", "que", "em", "um"),
    "it" -> Seq("il", "la", "di", "e", "che", "in", "per"),
    "nl" -> Seq("de", "het", "een", "en", "van", "is"),
    "sw" -> Seq("na", "ya", "wa", "ni", "kwa", "za", "katika"),
    "so" -> Seq("iyo", "ka", "oo", "waa", "ku", "ayaa", "soo"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk"))

  /** Data-driven language-ID over any profile table: one `s_<code>` score
    * column per profile plus `predicted_lang` — the argmax, with EARLIER
    * profiles winning ties. One shuffle-free pass: the argmax is
    * array_max over (score, -index, code) structs, so adding a language
    * is a table entry, not new comparison code. Generalizes the fixed
    * 4-way when-chain (same semantics on the same 4 profiles).
    */
  def langIdProfiled(text: Column, profiles: Seq[(String, Seq[String])]): Seq[Column] = {
    require(profiles.nonEmpty, "langIdProfiled needs at least one profile")
    val scored = profiles.map { case (code, stops) => code -> stopwordHits(text, stops) }
    val best = array_max(array(scored.zipWithIndex.map { case ((code, s), i) =>
      struct(s.as("score"), lit(-i).as("prio"), lit(code).as("lang"))
    }: _*))
    scored.map { case (code, s) => s.as(s"s_$code") } :+
      best.getField("lang").as("predicted_lang")
  }
}
