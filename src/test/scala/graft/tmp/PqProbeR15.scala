package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.similarity.{Knn, Pq}

/** r15 probe: stage breakdown of ann_pq_refined. */
object PqProbeR15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32,
      GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val eRaw = GraftSession.table(spark, dir, "embeddings")
    eRaw.count()
    for (rep <- 1 to 3) {
      println(s"[probe] === rep $rep ===")
      val e = eRaw.select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      val sample = t("sample (orderBy limit 4096) noopish") {
        val s0 = e.orderBy(col("id").asc).limit(4096); s0
      }
      val cb = t("train (m=8 ksub=16 iters=2) construct") {
        Pq.train(sample, m = 8, dim = 64, ksub = 16, iters = 2)
      }
      val cbc = t("collectCodebook") { Pq.collectCodebook(cb) }
      val codes = t("encode construct") { Pq.encode(e, cb, m = 8, dim = 64) }
      t("codes noop count") { codes.count() }
      val n = GraftSession.rowCount(spark, dir, "embeddings").toInt
      val out = t("refinedTopK construct") {
        Pq.refinedTopK(e.filter(col("id") < 8), e, codes, cb,
          k = 10, shortlist = n - 1, m = 8, dim = 64)
      }
      t("refinedTopK count") { out.count() }
      t("full query again (count)") {
        val cb2 = Pq.train(sample, m = 8, dim = 64, ksub = 16, iters = 2)
        val codes2 = Pq.encode(e, cb2, m = 8, dim = 64)
        Pq.refinedTopK(e.filter(col("id") < 8), e, codes2, cb2,
          k = 10, shortlist = n - 1, m = 8, dim = 64).count()
      }
    }
    spark.stop()
  }
}
