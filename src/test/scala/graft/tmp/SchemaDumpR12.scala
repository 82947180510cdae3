package graft.tmp

/** One-shot helper: prints the output schema DDL of the queries being moved
  * behind the deferred-frame leaf (their static output contract). */
object SchemaDumpR12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.get("local[8]")
    val names = Seq("ann_pq_refined", "bpe_encode_stats", "bpe_merges",
      "clustering_coeff", "configured_curation_export", "curation_export_fuzzy",
      "curation_funnel_fuzzy", "dedup_components", "dedup_keep_best",
      "linkage_entities", "pagerank", "regression_huber", "regression_logit",
      "regression_logit_multi", "regression_mi_logit", "regression_ols_multi",
      "triangle_count")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(s"SCHEMA\t$n\t${df.schema.toDDL}")
    }
    spark.stop()
  }
}
