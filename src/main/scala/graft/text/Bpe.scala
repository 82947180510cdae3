package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer: frequency-driven merge training
  * and greedy lowest-rank encoding — the learned-tokenizer step of a
  * training-data pipeline (`Vocab` covers the word-level stand-in; this is
  * the real subword path a 100 TB corpus would ship).
  *
  * Reference scope: the reference pipeline counts words and message tokens
  * but has no subword step (see `automated_analysis.py` length stats); BPE
  * is brief-mandated LLM-pipeline surface, patterned on the published
  * Sennrich et al. 2016 merge procedure.
  *
  * Scale shape: the corpus is read ONCE — a map-side-combinable word
  * count, cut to `topWords` with TakeOrderedAndProject (Zipf: the top
  * ~100k word types cover >99.9% of running text, and rarer types
  * contribute at most their tail mass to pair statistics). The merge loop
  * then runs over that vocabulary-bounded table on the driver — the same
  * bound that makes `Vocab.build`'s id window safe, and how published BPE
  * trainers work (merge statistics live on word TYPES × frequency, never
  * on the corpus). Encoding broadcasts the finished merge ranks; the
  * per-document work is embarrassingly parallel typed iteration (genuine
  * imperative per-row logic — the documented mapPartitions-class carve-out,
  * since a rank-greedy fixpoint has no Column expression form).
  */
object Bpe {

  /** (word, freq) for the `topWords` most frequent word types, ties broken
    * on the word. ONE corpus-scale aggregation; the limit keeps everything
    * downstream vocabulary-bounded.
    */
  def wordFreqs(df: DataFrame, text: Column, topWords: Int): DataFrame =
    df.select(explode(Vocab.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc).limit(topWords)

  /** Frequency-weighted adjacent-character pair counts over a (word, freq)
    * table — the statistics of the FIRST merge iteration, as a distributed
    * aggregation (the oracle-gated shape; later iterations run on the
    * driver against the same numbers, so this anchors the whole loop).
    * Single-character words contribute no pairs.
    */
  def initialPairCounts(wordFreq: DataFrame): DataFrame = {
    val n = length(col("word"))
    val idx = when(n >= 2, sequence(lit(1), n - 1))
      .otherwise(array().cast("array<int>"))
    wordFreq
      .select(col("word"), col("freq"), explode(idx).as("i"))
      .select(col("word").substr(col("i"), lit(1)).as("left_sym"),
        col("word").substr(col("i") + 1, lit(1)).as("right_sym"),
        col("freq"))
      .groupBy(col("left_sym"), col("right_sym"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Train `numMerges` merges on the corpus. Deterministic: best pair by
    * (count desc, left asc, right asc); stops early when no pair occurs
    * at least twice (a once-seen pair cannot compress anything).
    */
  def train(df: DataFrame, text: Column, numMerges: Int, topWords: Int): Seq[(String, String)] = {
    val wf = wordFreqs(df, text, topWords).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainLocal(wf, numMerges)
  }

  /** The merge loop over an in-memory word-frequency table (exposed for
    * spec-level verification against hand-computed merges).
    */
  def trainLocal(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var vocab: Array[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.size < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
      // linear argmax (count desc, pair asc) — no need to sort all P pairs
      // per merge when only the head is consumed
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, kv @ (pair, c)) =>
          acc match {
            case Some((bp, bc)) =>
              if (c > bc || (c == bc && Ordering[(String, String)].lt(pair, bp)))
                Some(kv)
              else acc
            case None => Some(kv)
          }
      }
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          vocab = vocab.map { case (syms, f) => (applyMerge(syms, pair), f) }
        case _ => go = false
      }
    }
    merges.toSeq
  }

  /** Replace every non-overlapping left-to-right occurrence of the pair. */
  private def applyMerge(syms: Array[String], m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy encode of one word: repeatedly merge ALL occurrences of the
    * lowest-rank adjacent pair until no ranked pair remains (the published
    * BPE inference procedure — encode order replays train order).
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var go = syms.length >= 2
    while (go) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) go = false
      else {
        syms = applyMerge(syms, bestPair)
        if (syms.length < 2) go = false
      }
    }
    syms
  }

  /** The merge table as data: (rank, left_sym, right_sym, piece) — what a
    * pipeline persists next to its shards so encode is reproducible.
    */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, l + r) }
      .toDF("rank", "left_sym", "right_sym", "piece")
  }

  /** Per-partition memoized encoder: under the Zipf distribution the same
    * frequent word types recur constantly, so each task encodes a TYPE once
    * and serves occurrences from a word→pieces cache (what published BPE
    * encoders do); the cache is task-local so there is no shared state.
    */
  private def cachedEncoder(rank: Map[(String, String), Int]): String => Array[String] = {
    val cache = scala.collection.mutable.HashMap.empty[String, Array[String]]
    w => cache.getOrElseUpdate(w, encodeWord(w, rank))
  }

  /** Encode every document: one row per subword piece, positions numbered
    * per document across word boundaries. Merge ranks are broadcast; no
    * shuffle — the explode happens inside the typed partition iteration.
    */
  def encode(df: DataFrame, id: Column, text: Column,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    // null text must not NPE the partition: tokens(null) decodes to a
    // null Seq, so coalesce to empty (zero pieces) like Vocab.encode's
    // explode would
    df.select(id.cast("long").as("doc_id"),
        coalesce(Vocab.tokens(text), array().cast("array<string>")).as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val enc = cachedEncoder(b.value)
        it.flatMap { case (docId, toks) =>
          val pieces = toks.iterator.flatMap(w => enc(w).iterator).toArray
          Iterator.range(0, pieces.length).map(i => (docId, i, pieces(i)))
        }
      }
      .toDF("doc_id", "pos", "piece")
  }

  /** Per-document compression accounting: words in, subword pieces out.
    * Row-local (one output row per input row), merge ranks broadcast and
    * the per-partition type cache shared across documents.
    */
  def encodeStats(df: DataFrame, id: Column, text: Column,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    df.select(id.cast("long").as("doc_id"),
        coalesce(Vocab.tokens(text), array().cast("array<string>")).as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val enc = cachedEncoder(b.value)
        it.map { case (docId, toks) =>
          var nPieces = 0L
          toks.foreach(w => nPieces += enc(w).length)
          (docId, toks.size.toLong, nPieces)
        }
      }
      .toDF("doc_id", "n_words", "n_pieces")
  }
}
