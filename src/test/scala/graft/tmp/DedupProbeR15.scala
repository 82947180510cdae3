package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.dedup.Dedup

/** r15 probe: is the documents-scan stage (simhash/minhash/shingle kernels)
  * worth a parallelism floor? */
object DedupProbeR15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32,
      GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val d = GraftSession.table(spark, dir, "documents")
    d.count(); d.count()
    for (rep <- 1 to 2) {
      println(s"[probe] === rep $rep ===")
      t("simhash64 kernel, 1 part (noop)") {
        noop(Dedup.simhash64(d, col("doc_id"), col("text")))
      }
      t("simhash64 kernel, repart 32 (noop)") {
        noop(Dedup.simhash64(d.repartition(32), col("doc_id"), col("text")))
      }
      t("simhash64_pairs full (count)") {
        Dedup.simhashPairs64(d, col("doc_id"), col("text"), 4, 3, 1000).count()
      }
      t("simhash64_pairs repart input (count)") {
        Dedup.simhashPairs64(d.repartition(32), col("doc_id"), col("text"), 4, 3, 1000).count()
      }
      t("minhash sigs 16 perms, 1 part (noop)") {
        noop(Dedup.minhashSignatures(d, col("doc_id"), col("text"), 3, 16))
      }
      t("minhash sigs 16 perms, repart 32 (noop)") {
        noop(Dedup.minhashSignatures(d.repartition(32), col("doc_id"), col("text"), 3, 16))
      }
      t("dedup_minhash_verified full (count)") {
        Dedup.minhashDedupVerified(d, col("doc_id"), col("text"), 3, 16, 4, 0.5).count()
      }
      t("dedup_minhash_verified repart (count)") {
        Dedup.minhashDedupVerified(d.repartition(32), col("doc_id"), col("text"), 3, 16, 4, 0.5).count()
      }
      t("prefix_filter full (count)") {
        Dedup.prefixFilterJoin(d, col("doc_id"), col("text"), 3, 0.4).count()
      }
      t("prefix_filter repart (count)") {
        Dedup.prefixFilterJoin(d.repartition(32), col("doc_id"), col("text"), 3, 0.4).count()
      }
      t("tfidf_topterms full (count)") {
        graft.text.Vocab.tfidfTopTerms(d, col("doc_id"), col("text"), 3).count()
      }
      t("tfidf_topterms repart (count)") {
        graft.text.Vocab.tfidfTopTerms(d.repartition(32), col("doc_id"), col("text"), 3).count()
      }
    }
    spark.stop()
  }
}
