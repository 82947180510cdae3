package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.similarity.{Knn, Pq}

/** Throwaway dev probe: PQ at 1M vectors x 64 dims — codebook trained on a
  * 10k sample (the standard practice: train on a sample, encode the
  * corpus), one-time encode cost, then the per-query scan cost of fused
  * ADC over m=8 codes vs the brute-force 64-dim dot-product scan, plus the
  * at-rest size ratio of the code column vs the raw vectors.
  */
object PqScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val n = 1000000L
    val dim = 64
    val m = 8
    val corpus = spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / lit(1000.0))).as("vec"))
      .localCheckpoint()
    println(s"SCALE corpus ${corpus.count()} x $dim")

    val sample = corpus.where(col("id") % 100 === 0) // 10k training rows
    val cb = time("pq_train_10k_sample") {
      val c = Pq.train(sample, m, dim, ksub = 16, iters = 2)
      c.count(); c
    }
    val codes = time("pq_encode_1M") {
      val c = Pq.encode(corpus, cb, m, dim).localCheckpoint()
      c.count(); c
    }

    val queries = corpus.where(col("id") % 125000 === 3) // 8 queries
    time("brute_force_top10_8q_1M") {
      Knn.bruteForceTopK(queries, corpus, 10).count()
    }
    time("adc_top10_8q_1M") {
      Pq.adcTopK(queries, codes, cb, 10, m, dim).count()
    }

    // at-rest size: m ints (stored; bytes conceptually) vs dim doubles
    val tmp = java.nio.file.Files.createTempDirectory("pq_probe").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/raw")
    codes.write.mode("overwrite").parquet(s"$tmp/codes")
    def dirSize(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    println(f"SCALE at_rest raw=${dirSize(s"$tmp/raw") / 1e6}%.1f MB codes=${dirSize(s"$tmp/codes") / 1e6}%.1f MB")
    spark.stop()
  }
}
