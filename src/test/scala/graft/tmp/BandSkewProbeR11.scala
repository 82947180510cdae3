package graft.tmp

import org.apache.spark.sql.functions._

/** Round-11 planted-skew probe for the MinHash band join (VERDICT r10 #6).
  *
  * Plants a boilerplate cluster (identical text ⇒ identical signature ⇒ one
  * hot (band, bk) bucket in EVERY band) inside a 1M-doc corpus and runs the
  * full verified dedup (`Dedup.minhashDedupVerified`). Records:
  *   - wall seconds and surviving pair count (hot cluster of h docs must
  *     yield exactly h·(h−1)/2 verified pairs, jaccard = 1);
  *   - the band-key skew profile (hottest bucket share — the
  *     key_skew_report diagnosis applied to our own join key);
  *   - whether AQE's skew-join split engaged on the band self-join
  *     (executed-plan scan for skew-marked shuffle reads) — possible only
  *     because the join carries NO broadcast hint (PlanAuditSpec pins that).
  *
  * Note the semantic bound: docs sharing a band ARE all-pairs candidates by
  * LSH construction, so the planted cluster is sized to a realistic
  * boilerplate blob (thousands), not a corpus fraction — a million-doc
  * identical cluster is a quadratic CONTRACT, not a partitioning defect,
  * and exact-dedup-first is the documented pre-filter for that regime.
  */
object BandSkewProbeR11 {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 1000000
    val hot = if (args.length > 1) args(1).toInt else 3000
    val spark = graft.GraftSession.builder("local[32]", 32,
      graft.GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic corpus: unique 20-word texts from a seeded hash chain;
    // the first `hot` docs all share one boilerplate text
    val words = (c: org.apache.spark.sql.Column) =>
      concat_ws(" ", (0 until 20).map(i =>
        format_string("w%d", pmod(hash(c * 31 + i), lit(5000)))): _*)
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        when(col("id") < hot, lit("the quick brown boilerplate " +
          (0 until 16).map(i => s"blob$i").mkString(" ")))
          .otherwise(words(col("id"))).as("text"))
      .localCheckpoint(true) // freeze inputs so generation isn't timed

    // band-key skew diagnosis (the key_skew_report medicine on our own key)
    val bands = graft.dedup.Dedup.bandKeys(
      graft.dedup.Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16), 16, 4)
    val prof = bands.groupBy(col("band"), col("bk")).count()
      .agg(count(lit(1)).as("buckets"), max(col("count")).as("hottest")).head()
    println(s"BAND_PROFILE buckets=${prof.getLong(0)} hottest_bucket=${prof.getLong(1)}")

    // execute THROUGH the DataFrame's own QueryExecution (a .count() spawns
    // a separate execution whose adaptive plan never materializes — the
    // round-11 probe's first lesson) so the inspected plan is the one that ran
    def runAndInspect(df: org.apache.spark.sql.DataFrame): (Long, Double, Boolean) = {
      val qe = df.queryExecution
      val t = System.nanoTime()
      val n = qe.toRdd.count()
      val secs = (System.nanoTime() - t) / 1e9
      val plan = qe.executedPlan.toString
      (n, secs, plan.contains("skew"))
    }
    val expectHot = hot.toLong * (hot - 1) / 2
    val (pairs, secs, skewEngaged) = runAndInspect(
      graft.dedup.Dedup.minhashDedupVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.8))
    println(f"BAND_SKEW n=$nDocs hot=$hot pairs=$pairs (planted=$expectHot) " +
      f"secs=$secs%.1f aqe_skew_split=$skewEngaged")

    // Second measurement with the skew thresholds scaled to the PROBE's
    // byte volume (defaults: 256 MB / 5x — sized for production partitions,
    // which a 1M-doc local replica never reaches): proves the valve itself
    // engages on this plan shape once byte skew materializes, i.e. nothing
    // in the plan (hint, join type) blocks OptimizeSkewedJoin.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
    val (pairs2, secs2, skew2) = runAndInspect(
      graft.dedup.Dedup.minhashDedupVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.8))
    println(f"BAND_SKEW_LOWTHRESH pairs=$pairs2 secs=$secs2%.1f aqe_skew_split=$skew2")

    // Third pass: make the hot bucket VISIBLE as input-byte skew (fine
    // shuffle grain so the bucket dominates its partition) — the proof
    // that OptimizeSkewedJoin is free to fire on this exact plan shape.
    spark.conf.set("spark.sql.shuffle.partitions", "1024")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    val (pairs3, secs3, skew3) = runAndInspect(
      graft.dedup.Dedup.minhashDedupVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.8))
    println(f"BAND_SKEW_FINEGRAIN pairs=$pairs3 secs=$secs3%.1f aqe_skew_split=$skew3")
    spark.stop()
  }
}
