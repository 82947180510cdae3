package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.{Sources, StatsManifest}

/** Throwaway dev probe: stats-manifest file skipping at 20M rows over 64
  * range-clustered files — manifest build cost, candidate-file counts for
  * a narrow time slice and a point key, and scan time pruned vs unpruned.
  * (On local disk parquet footers are cheap, so the local win is modest;
  * the candidate-file count is the number that matters — each skipped file
  * is a skipped footer fetch + scan task at object-store scale.)
  */
object SkipScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val n = 20000000L
    val base = java.nio.file.Files.createTempDirectory("skip_probe").toString
    val path = s"$base/events"
    val df = spark.range(n).select(
      (col("id") * 3).cast("timestamp").as("ts"),
      concat(lit("user_"), pmod(xxhash64(col("id")), lit(2000000)).cast("string")).as("user_id"),
      col("id").as("payload"))
    time("write_range_layout_64f_20M") {
      Sources.writeRangeLayout(df, path, "ts", 64)
    }
    // ~312k rows and ~300k distinct user_ids per file: size the bloom at
    // ~14 bits per distinct key (2^22) for a low per-file FP rate
    time("manifest_build_ts_range_userid_bloom") {
      StatsManifest.build(spark, path, rangeCols = Seq("ts"), bloomCols = Seq("user_id"),
        bloomBits = 1 << 22)
    }

    // ~0.5% time slice
    val lo = lit("1971-06-01 00:00:00").cast("timestamp")
    val hi = lit("1971-06-02 00:00:00").cast("timestamp")
    val rangeFiles = time("prune_decision_range") {
      StatsManifest.prunedFiles(spark, path, Seq(("ts", lo, hi)))
    }
    println(s"SCALE range_candidates ${rangeFiles.length}/64 files")
    time("full_scan_range_filter") {
      spark.read.parquet(path).where(col("ts") >= lo && col("ts") <= hi).count()
    }
    time("pruned_scan_range_filter") {
      StatsManifest.readPruned(spark, path, Seq(("ts", lo, hi))).count()
    }

    val key = lit("user_1234567")
    val eqFiles = time("prune_decision_bloom") {
      StatsManifest.prunedFiles(spark, path, Nil, Seq(("user_id", key)))
    }
    println(s"SCALE bloom_candidates ${eqFiles.length}/64 files")
    time("full_scan_point_filter") {
      spark.read.parquet(path).where(col("user_id") === key).count()
    }
    time("pruned_scan_point_filter") {
      StatsManifest.readPruned(spark, path, Nil, Seq(("user_id", key))).count()
    }
    spark.stop()
  }
}
