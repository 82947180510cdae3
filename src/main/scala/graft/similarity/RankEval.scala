package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality read-out for the ANN surface: per query, NDCG@k,
  * precision@k, MRR and hit count of a ranked result list against a
  * label-match relevance oracle (same label = relevant, the standard
  * proxy when no judgment set exists). This is the eval that tells you
  * whether an approximate index (LSH/IVF/PQ) is GOOD ENOUGH to ship, in
  * ranking terms rather than plain recall (a miss at rank 1 and a miss
  * at rank 10 are different failures; ann_recall_report can't see that).
  *
  * Determinism discipline: every DCG/IDCG term is 1/log2(position+1) on
  * exact integer positions, q6-quantized before a DECIMAL sum (the
  * kaplan_meier ln() idiom); ndcg is one IEEE division of the two exact
  * sums, r6 at output. IDCG rides an exploded integer sequence of length
  * min(k, R) — R = same-label corpus rows minus the query itself — so a
  * query whose label has no other member reports NULL ndcg (nothing to
  * rank) rather than 0/0. MRR is 0.0 when no relevant row is retrieved
  * (the standard convention), else q6(1/first-relevant-rank).
  *
  * Scale shape: `ranked` is queries×k rows by construction and
  * `labels` joins are broadcast; nothing here rescans the corpus — the
  * expensive part happened in the retrieval being evaluated.
  */
object RankEval {

  private val r6 = graft.util.Portable.round6 _
  private def q6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** `ranked`: (query_id, vec_id, rank) — any top-k variant's output.
    * `labels`: (id, label) for the whole corpus. Output per query:
    * query_id, n_rel_corpus, hits, precision_at_k, mrr, ndcg.
    */
  def labelMatchEval(ranked: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"labelMatchEval needs k >= 1, got $k")
    val lq = broadcast(labels.select(col("id").as("query_id"), col("label").as("__lq")))
    val lc = broadcast(labels.select(col("id").as("vec_id"), col("label").as("__lc")))
    val labelCounts = labels.groupBy(col("label")).agg(count(lit(1)).as("__nl"))
    // R = same-label corpus rows excluding the query itself
    val rOf = broadcast(labels.select(col("id").as("query_id"), col("label"))
      .join(broadcast(labelCounts), Seq("label"))
      .select(col("query_id"), (col("__nl") - 1L).as("n_rel_corpus")))
    val rel = ranked.select(col("query_id"), col("vec_id"), col("rank"))
      .join(lq, Seq("query_id")).join(lc, Seq("vec_id"))
      .withColumn("__rel", col("__lq") === col("__lc"))
    val perQuery = rel.groupBy(col("query_id")).agg(
      sum(when(col("__rel"), 1L).otherwise(0L)).as("hits"),
      sum(when(col("__rel"),
        q6(lit(1.0) / log2(col("rank").cast("double") + lit(1.0))))
        .otherwise(lit(0.0)).cast("decimal(28,6)")).as("__dcg"),
      min(when(col("__rel"), col("rank"))).as("__firstRel"))
    val ideal = rOf.filter(col("n_rel_corpus") >= 1)
      .select(col("query_id"),
        explode(sequence(lit(1), least(lit(k), col("n_rel_corpus")))).as("__i"))
      .groupBy(col("query_id"))
      .agg(sum(q6(lit(1.0) / log2(col("__i").cast("double") + lit(1.0)))
        .cast("decimal(28,6)")).as("__idcg"))
    perQuery
      .join(broadcast(rOf), Seq("query_id"))
      .join(broadcast(ideal), Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel_corpus"), col("hits"),
        r6(col("hits").cast("double") / lit(k.toDouble)).as("precision_at_k"),
        when(col("__firstRel").isNotNull,
          q6(lit(1.0) / col("__firstRel").cast("double"))).otherwise(lit(0.0)).as("mrr"),
        when(col("__idcg").isNotNull,
          r6(col("__dcg").cast("double") / col("__idcg").cast("double"))).as("ndcg"))
  }
}
