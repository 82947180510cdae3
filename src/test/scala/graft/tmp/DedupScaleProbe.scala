package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.dedup.Dedup

/** Throwaway dev probe: the MinHash-LSH dedup family at ~400x the sf0.1
  * document count. 2M synthetic 16-word docs (deterministic hash-derived
  * words, ~28M shingle instances), with 5% planted near-dups (15/16 words
  * shared with the predecessor doc). Measures the costs the 100 TB design
  * claims: signature/index build is one scan, candidate volume stays
  * pair-bounded (never n^2), verification touches candidates only, and the
  * incremental path is batch-bound against a persisted archive index.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val n = 2000000L
    val vocab = 500000L
    // every 20th doc copies its predecessor's word stream except position 1
    // -> a planted near-dup pair (15/16 words, shingle Jaccard ~0.79)
    val baseId = when(pmod(col("id"), lit(20)) === 19, col("id") - 1).otherwise(col("id"))
    val words = transform(sequence(lit(1), lit(16)), i =>
      concat(lit("w"), pmod(xxhash64(
        when(i === 1, col("id") * 16 + i).otherwise(baseId * 16 + i)), lit(vocab))))
    val docs = spark.range(n)
      .select(col("id").as("doc_id"), concat_ws(" ", words).as("text"))
      .localCheckpoint()

    time("baseline_count_2M") { docs.count() }

    // the archive index build: ONE scan pays signatures + band keys
    // (localCheckpoint is eager, so it belongs inside the timer)
    var index: org.apache.spark.sql.DataFrame = null
    time("band_index_build_2M") {
      index = Dedup.bandKeys(
        Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16), 16, 4)
        .localCheckpoint()
      index.count()
    }

    // candidate generation only (band-bucket self-join, never n^2)
    time("lsh_candidates_2M") {
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16), 16, 4).count()
    }

    // full verified flow: candidates + exact Jaccard on candidates only
    time("minhash_verified_j05_2M") {
      Dedup.minhashDedupVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.5).count()
    }

    // exact dedup for contrast (one hash shuffle)
    time("exact_dedup_2M") {
      Dedup.exact(docs, col("doc_id"), col("text")).count()
    }

    // the always-on path: a 20k batch against the PERSISTED 2M index —
    // only the batch pays signature cost
    val batch = spark.range(n, n + 20000L)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(16)), i =>
          // half the batch re-ingests existing docs (id - n), half is new
          concat(lit("w"), pmod(xxhash64(
            when(pmod(col("id"), lit(2)) === 0, (col("id") - n) * 16 + i)
              .otherwise(col("id") * 16 + i)), lit(vocab))))).as("text"))
    time("incremental_candidates_20k_vs_2M_index") {
      Dedup.incrementalCandidates(
        Dedup.minhashSignatures(batch, col("doc_id"), col("text"), 3, 16),
        index, 16, 4).count()
    }

    spark.stop()
  }
}
