package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.similarity.{Knn, Pq}

/** Throwaway dev probe: IVF-PQ recall at 1M corpus scale with PLANTED
  * neighbors (the DedupScaleProbe methodology): each of 8 queries gets 10
  * deterministic near-duplicates mixed into the corpus; the probe
  * measures how many of them IVF-PQ (coarse k=64, nprobe=4, m=8 residual
  * codes, everything trained on a 10k sample) recovers in its top-10,
  * and what fraction of the corpus each query actually scanned.
  */
object IvfPqRecallProbe {
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
    val base = spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / lit(1000.0))).as("vec"))
    val queries = base.where(col("id") % 125000 === 3) // 8 queries
    // 10 planted near-dups per query: tiny deterministic per-component
    // perturbation, ids n.. n+79
    val planted = queries.crossJoin(spark.range(10).select(col("id").as("j")))
      .select(
        (lit(n) + col("id") / lit(125000) * 10 + col("j")).as("id"),
        transform(col("vec"),
          x => x + (pmod(xxhash64(col("j"), x), lit(100)) / lit(1000000.0))).as("vec"))
    val corpus = base.unionByName(planted).localCheckpoint()
    println(s"SCALE corpus ${corpus.count()} (incl. 80 planted)")

    val sample = corpus.where(col("id") % 100 === 0)
    val coarse = time("coarse_kmeans_k64_10k_sample") {
      val c = Knn.kmeansCentroids(sample, 64, 3); c.count(); c
    }
    val cb = time("ivfpq_train_10k_sample") {
      val c = Pq.ivfPqTrain(sample, coarse, m, dim, ksub = 16, iters = 2); c.count(); c
    }
    val enc = time("ivfpq_encode_1M") {
      val e = Pq.ivfPqEncode(corpus, coarse, cb, m, dim).localCheckpoint(); e.count(); e
    }
    val approx = time("ivfpq_top10_8q_nprobe4") {
      val a = Pq.ivfPqTopK(queries, enc, coarse, cb, 10, nprobe = 4, m = m, dim = dim)
        .localCheckpoint()
      a.count(); a
    }
    // recall of the planted neighbors (ids >= n are planted; query q's
    // planted block is [n + q/125000*10, n + q/125000*10 + 10))
    val hits = approx
      .where(col("vec_id") >= n &&
        (col("vec_id") - lit(n)) / lit(10) === col("query_id") / lit(125000))
      .count()
    println(f"SCALE planted_recall ${hits / 80.0}%.3f ($hits/80)")
    // scanned fraction: candidates per query / corpus size
    val bucketSizes = enc.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
    val probed = Pq.residuals(queries, coarse, topN = 4)
      .select(col("id"), col("bucket"))
      .join(bucketSizes, Seq("bucket"))
      .groupBy(col("id")).agg(sum(col("bn")).as("cand"))
      .agg(avg(col("cand"))).head.getDouble(0)
    println(f"SCALE scan_fraction ${probed / corpus.count()}%.4f")
    spark.stop()
  }
}
