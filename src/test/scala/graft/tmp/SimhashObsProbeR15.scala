package graft.tmp

import org.apache.spark.sql.functions._

object SimhashObsProbeR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val hot = (1 to 25).map(i => (i.toLong, "identical boilerplate body that every record repeats verbatim"))
    val healthy = Seq(
      (101L, "a perfectly ordinary document about spark physical planning"),
      (102L, "a perfectly ordinary document about spark physical planning!"))
    val docs = (hot ++ healthy).toDF("doc_id", "text")
    val (pairs, obs) = graft.dedup.Dedup.simhashPairs64Observed(
      docs, col("doc_id"), col("text"), numBands = 4, maxHamming = 3, maxBucketSize = 10L)
    pairs.printSchema()
    val rows = pairs.collect()
    println(s"pairs: ${rows.length}")
    println("FINAL PLAN:\n" + pairs.queryExecution.executedPlan.toString.take(4000))
    println("obs map: " + obs.get)
    org.apache.spark.sql.graft.Bridge.releaseShared()
    spark.stop()
  }
}
