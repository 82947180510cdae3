package graft.tmp

import org.apache.spark.sql.functions._

/** Round-10 scale probe: semDedupAuto on the 100x replica's embeddings.
  * The oracle-bound `semdedup` query pins k=8 for a SQL-expressible
  * quantizer — at 200k vectors that is ~2.5e9 in-cluster pairs, exactly
  * the fixed-k blowup semDedupAuto exists to prevent. This records the
  * auto-k wall time + pair-work profile at sf10 (timing-only; iterative
  * kmeans has no SQL oracle). */
object ScaleProbeR10 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/sf10"
    val spark = graft.GraftSession.builder("local[32]", 32,
      graft.GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.GraftSession.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"),
        graft.similarity.Knn.toDoubleArray(col("embedding")).as("vec"))
    val n = e.count()
    val t0 = System.nanoTime()
    val out = graft.similarity.Knn.semDedupAuto(e, minCos = 0.3)
    val kept = out.filter(col("keep")).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val sizes = out.groupBy(col("cluster")).count()
      .agg(count(lit(1)).as("k"), max(col("count")).as("cmax"),
        avg(col("count")).as("cavg")).head()
    println(f"SEMDEDUP_AUTO n=$n kept=$kept secs=$secs%.1f " +
      f"k=${sizes.getLong(0)} cmax=${sizes.getLong(1)} cavg=${sizes.getDouble(2)}%.1f")
    spark.stop()
  }
}
