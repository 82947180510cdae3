package graft.tmp

import graft.GraftSession
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Throwaway dev harness: stage-wise timing of the minhash LSH pipeline. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = GraftSession.table(spark, sfDir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"MHPROBE $label n=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16)
    time("signatures")(sigs.agg(count(lit(1))).head.getLong(0))
    val bands = Dedup.bandKeys(sigs, 16, 4)
    time("bandkeys")(bands.agg(count(lit(1))).head.getLong(0))
    time("full_lsh")(Dedup.lshCandidatePairs(sigs, 16, 4).count())
    spark.stop()
  }
}
