package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** BM25 document ranking (Robertson/Spärck Jones probabilistic retrieval —
  * the default lexical ranker in Lucene/Elasticsearch) — the retrieval
  * sibling of `tfidf_topterms`: tf-idf summarizes a document's own terms,
  * BM25 ranks documents against a QUERY with document-length
  * normalization and tf saturation. In a training-data pipeline this is
  * the lexical half of retrieval-based curation: finding the documents
  * most relevant to a probe query (contamination hunting, targeted
  * corpus slicing, retrieval-augmented eval set construction).
  *
  * Scale shape: ZERO corpus-sized shuffles. Document length is computed
  * on the row (size of the filtered token array, no explode); document
  * frequencies dedupe terms per-doc on the row (array_distinct) so the
  * df exchange carries vocabulary-sized partial counts; the query-term
  * broadcast filter runs before the tf aggregation so only hit rows are
  * exchanged, with dl riding the row as a group key instead of a
  * corpus-sized join. The corpus is scanned three times (stats, df, tf)
  * — scans are embarrassingly parallel and cheap; it is the token-pair
  * exchanges that kill a 100 TB run, and this plan has none. Corpus
  * scalars (N, avgdl) ride a broadcast cross join; scoring and ranking
  * touch only documents containing at least one query term.
  *
  * Numeric determinism (the lm_bigram_score discipline): the idf and each
  * per-term score part are rounded with the portable floor arithmetic,
  * parts are summed as DECIMAL(18,6) (order-independent exact sum), ranks
  * break ties on doc_id. All float constants are written as the same
  * literal arithmetic on both engine and oracle so constant folding
  * cannot produce a different double.
  */
object Bm25 {

  private val r6 = graft.util.Portable.round6 _

  /** Rank documents by BM25 against the corpus's `numTerms`
    * highest-document-frequency terms (a deterministic, data-derived
    * probe query; in production the query terms arrive as a parameter).
    * Returns the top `k` docs: (doc_id, n_terms_hit, bm25, rank).
    */
  def topDocs(docs: DataFrame, id: Column, text: Column,
              numTerms: Int, k: Int,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // NOTHING in this query shuffles corpus-sized data. Every per-document
    // quantity is computed ROW-LOCALLY before any exchange:
    //   dl    — token count via size(filter(split(...))) on the row, no
    //           explode, no groupBy(doc_id) over exploded tokens;
    //   df    — per-doc term DEDUP via array_distinct on the row, so the
    //           explode feeds a term-keyed partial aggregate and the
    //           exchange carries (term, partial count) — VOCABULARY-sized
    //           per partition, never corpus-sized (the (doc_id, term)
    //           distinct-shuffle formulation moves every token pair);
    //   tf    — the broadcast query-term semi-filter runs BEFORE the
    //           aggregation, so only hit rows are exchanged, and dl rides
    //           the row as a group key instead of a corpus-sized join.
    // (doc ids are assumed non-null and physically distinct — the df count
    // is per document row.)
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val tokens = filter(split(col("text"), " ", -1), t => t =!= "")
    val withDl = base.select(col("doc_id"), col("text"),
      size(tokens).cast("long").as("dl"))
    // corpus scalars over token-bearing docs (the population the exploded
    // formulation sees): one tiny agg row, broadcast with the cross join
    val stats = withDl.filter(col("dl") > 0L)
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dft = base.select(explode(array_distinct(tokens)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = dft.orderBy(col("df").desc, col("term").asc).limit(numTerms)

    val tf = withDl
      .select(col("doc_id"), col("dl"),
        explode(split(col("text"), " ", -1)).as("term"))
      .filter(col("term") =!= "")
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("doc_id"), col("term"), col("df"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .crossJoin(broadcast(stats))
      // idf = ln((N - df + 0.5)/(df + 0.5) + 1) — the +1 variant is
      // never negative (Lucene's choice); rounded before use
      .withColumn("idf", r6(log(
        ((col("n_docs").cast("double") - col("df").cast("double")) + lit(0.5))
          / (col("df").cast("double") + lit(0.5)) + lit(1.0))))
      // per-term part; constants written as the same arithmetic the
      // oracle SQL uses so both engines fold to identical doubles
      .withColumn("part", r6(
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double")
            + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / col("avgdl"))))
        .cast(DecimalType(18, 6)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("part")).as("score_sum"))
      .select(col("doc_id"), col("n_terms_hit"),
        r6(col("score_sum").cast("double")).as("bm25"))
    // global top-k via orderBy+limit (TakeOrderedAndProject): each task
    // keeps a k-sized heap and the driver merges n_tasks×k rows — no
    // single-partition WindowExec at any scale (round 16; the former
    // global rank window was WindowGroupLimit-bounded per task but still
    // funneled every task's survivors through one merge partition, and
    // spiked to 25 s in a contended run). The ordering is total (doc_id
    // tiebreak), so limit(k) selects exactly the rows rank<=k selected;
    // the rank column is then minted by a window over just those k rows —
    // a k-row single partition, constant-bounded.
    val topK = scored.orderBy(col("bm25").desc, col("doc_id").asc).limit(k)
    // partitionBy(lit(1)): one DECLARED partition over the k-row frame —
    // identical ranks (the partition holds every row), but no
    // "No Partition Defined" WindowExec warning in the bench tail
    val w = Window.partitionBy(lit(1)).orderBy(col("bm25").desc, col("doc_id").asc)
    topK.withColumn("rank", row_number().over(w))
  }
}
