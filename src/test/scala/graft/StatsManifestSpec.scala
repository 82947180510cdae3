package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.BloomBitsetAgg
import graft.sources.{Sources, StatsManifest}

/** Proves the file-skipping stats manifest: Bloom bitsets are partition-
  * order-independent, range and point predicates prune the file list from
  * the manifest alone, pruned results equal the unpruned filter exactly,
  * and a stale/partial manifest degrades to reading more files — never to
  * losing rows.
  */
class StatsManifestSpec extends SparkSpec {
  import spark.implicits._

  test("bloomBitset sets exactly the requested bits and merges by OR") {
    val df = Seq(Seq(0L, 1L, 64L), Seq(127L), Seq(1L)).toDF("pos")
    def words(parts: Int): Seq[Long] =
      df.repartition(parts)
        .agg(BloomBitsetAgg.bloomBitset(col("pos"), 128)).as[Seq[Long]].head()
    // bits 0, 1, 64, 127 -> word0 = b11, word1 = bit0 | bit63
    val want = Seq(3L, 1L | (1L << 63))
    assert(words(1) == want)
    assert(words(7) == want) // merge across many partial buffers: same bitset
  }

  test("bloom positions are deterministic, in range, and NULL-safe") {
    val got = spark.range(1).select(
      StatsManifest.bloomPositions(lit("user_42"), 1 << 10, 5).as("p"),
      StatsManifest.bloomPositions(lit(null).cast("string"), 1 << 10, 5).as("np"))
      .head
    val ps = got.getSeq[Long](0)
    assert(ps.length == 5 && ps.forall(p => p >= 0 && p < (1 << 10)))
    assert(got.isNullAt(1)) // NULL value sets no bits
  }

  // a small "events" table laid out range-clustered on ts so min/max
  // intervals are disjoint — the layout the manifest is built to exploit
  private def writeFixture(): (String, org.apache.spark.sql.DataFrame) = {
    val base = Files.createTempDirectory("graft_stats").toString
    val path = s"$base/events"
    val df = spark.range(4096).select(
      (col("id") * 60).cast("timestamp").as("ts"),
      concat(lit("user_"), (col("id") % 257).cast("string")).as("user_id"),
      col("id").as("payload"))
    Sources.writeRangeLayout(df, path, "ts", 16)
    StatsManifest.build(spark, path, rangeCols = Seq("ts", "user_id"),
      bloomCols = Seq("user_id"), bloomBits = 1 << 12, bloomHashes = 5)
    (path, df)
  }

  test("range predicate prunes to the few overlapping files; rows match the full filter") {
    val (path, df) = writeFixture()
    val lo = lit("1970-01-01 10:00:00").cast("timestamp")
    val hi = lit("1970-01-01 12:00:00").cast("timestamp")
    val all = spark.read.parquet(path).inputFiles.length
    assert(all == 16)
    val files = StatsManifest.prunedFiles(spark, path, Seq(("ts", lo, hi)))
    // 2 hours of a ~68-hour range over 16 range-clustered files: a handful
    // of candidates (sampled range boundaries make file spans approximate)
    assert(files.length <= 3, s"expected <=3 candidate files, got ${files.length}")
    val got = StatsManifest.readPruned(spark, path, Seq(("ts", lo, hi)))
      .select("payload").as[Long].collect().sorted
    val want = df.where(col("ts") >= lo && col("ts") <= hi)
      .select("payload").as[Long].collect().sorted
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("bloom equality predicate prunes files and never drops a matching row") {
    val (path, df) = writeFixture()
    val v = lit("user_7")
    val files = StatsManifest.prunedFiles(spark, path, Nil, Seq(("user_id", v)))
    // user_id is uncorrelated with the ts layout, so min/max spans are
    // useless — only the bloom can prune. With 16 rows per user spread over
    // 16 files pruning may be partial; it must at least never be wrong:
    val got = StatsManifest.readPruned(spark, path, Nil, Seq(("user_id", v)))
      .select("payload").as[Long].collect().sorted
    val want = df.where(col("user_id") === v).select("payload").as[Long].collect().sorted
    assert(got.sameElements(want) && got.length == 16)
    assert(files.length <= 16)

    // the manifest records the measured bloom fill; tiny fixture -> low fill
    val fills = spark.read.parquet(StatsManifest.statsDir(path))
      .select(col("bloom_fill_user_id")).collect().map(_.getDouble(0))
    assert(fills.nonEmpty && fills.forall(f => f > 0.0 && f < 0.5), fills.mkString(","))

    // an absent value must prune to zero files (no false "must scan"):
    // with 4096 bits / ~256 rows per file the FP chance per file is tiny;
    // tolerate <=1 false positive file to keep the test robust
    val absent = StatsManifest.prunedFiles(spark, path, Nil, Seq(("user_id", lit("no_such_user"))))
    assert(absent.length <= 1, s"bloom should prune an absent key, kept ${absent.length}")
    val none = StatsManifest.readPruned(spark, path, Nil, Seq(("user_id", lit("no_such_user"))))
    assert(none.count() == 0)
  }

  test("conjunction of range + equality prunes harder than either alone") {
    val (path, df) = writeFixture()
    val lo = lit("1970-01-01 10:00:00").cast("timestamp")
    val hi = lit("1970-01-01 12:00:00").cast("timestamp")
    val v = lit("user_7")
    val both = StatsManifest.prunedFiles(spark, path, Seq(("ts", lo, hi)), Seq(("user_id", v)))
    val rangeOnly = StatsManifest.prunedFiles(spark, path, Seq(("ts", lo, hi)))
    assert(both.length <= rangeOnly.length)
    val got = StatsManifest.readPruned(spark, path, Seq(("ts", lo, hi)), Seq(("user_id", v)))
      .select("payload").as[Long].collect().sorted
    val want = df.where(col("ts") >= lo && col("ts") <= hi && col("user_id") === v)
      .select("payload").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("files unknown to the manifest are always read (stale manifest loses no rows)") {
    val (path, df) = writeFixture()
    // new data lands AFTER the manifest was built
    val extra = spark.range(4096, 4196).select(
      (col("id") * 60).cast("timestamp").as("ts"),
      lit("late_user").as("user_id"),
      col("id").as("payload"))
    extra.write.mode("append").parquet(path)
    // predicate matches ONLY the late rows; the manifest knows nothing
    // about their files, so they must survive pruning
    val got = StatsManifest.readPruned(spark, path, Nil, Seq(("user_id", lit("late_user"))))
      .select("payload").as[Long].collect().sorted
    assert(got.length == 100 && got.head == 4096)
    // and the original predicate results are unchanged
    val v = lit("user_7")
    val orig = StatsManifest.readPruned(spark, path, Nil, Seq(("user_id", v)))
      .select("payload").as[Long].collect().sorted
    val want = df.where(col("user_id") === v).select("payload").as[Long].collect().sorted
    assert(orig.sameElements(want))
  }

  test("incremental update: batch-bound extension, stale rows dropped, probes compatible") {
    val (path, df) = writeFixture()
    val before = spark.read.parquet(StatsManifest.statsDir(path))
    val nBefore = before.count()

    // a late batch lands, then the manifest is UPDATED (not rebuilt)
    spark.range(4096, 4196).select(
      (col("id") * 60).cast("timestamp").as("ts"),
      lit("late_user").as("user_id"),
      col("id").as("payload"))
      .repartition(2).write.mode("append").parquet(path)
    StatsManifest.update(spark, path)

    val after = spark.read.parquet(StatsManifest.statsDir(path))
    assert(after.count() == nBefore + 2) // exactly the new files were aggregated
    // the new rows are probe-compatible with the old: a bloom lookup for a
    // late-batch-only key now PRUNES to the new files instead of falling
    // back to "unknown, read everything"
    val files = StatsManifest.prunedFiles(spark, path, Nil, Seq(("user_id", lit("late_user"))))
    assert(files.length <= 3, s"expected the 2 new files (+<=1 FP), got ${files.length}")
    val got = StatsManifest.readPruned(spark, path, Nil, Seq(("user_id", lit("late_user"))))
      .agg(count(lit(1)), min(col("payload"))).head
    assert(got.getLong(0) == 100 && got.getLong(1) == 4096)
    // and old keys still resolve over the union
    val v7 = StatsManifest.readPruned(spark, path, Nil, Seq(("user_id", lit("user_7")))).count()
    assert(v7 == df.where(col("user_id") === "user_7").count())

    // a data file disappears (compaction/vacuum): update drops its row
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).filter(p => p.getName.endsWith(".parquet")).head
    fs.delete(victim, false)
    StatsManifest.update(spark, path)
    assert(spark.read.parquet(StatsManifest.statsDir(path)).count() == nBefore + 1)
  }

  test("hive-partitioned layout: partition columns survive the pruned read and update") {
    val base = Files.createTempDirectory("graft_stats_part").toString
    val path = s"$base/t"
    val df = spark.range(1000).select(
      col("id"),
      (col("id") % 4).cast("string").as("k"),   // partition column
      (col("id") % 100).as("v"))
    df.write.partitionBy("k").parquet(path)
    StatsManifest.build(spark, path, rangeCols = Seq("v", "k"))

    // range predicate on the PARTITION column: stats must have captured it
    // (not NULL), and the pruned read must materialize it from the paths
    val got = StatsManifest.readPruned(spark, path, Seq(("k", lit("2"), lit("2"))))
      .select("id").as[Long].collect().sorted
    val want = df.where(col("k") === "2").select("id").as[Long].collect().sorted
    assert(got.sameElements(want) && got.nonEmpty)
    // and it actually pruned: only k=2's files survive the manifest filter
    val files = StatsManifest.prunedFiles(spark, path, Seq(("k", lit("2"), lit("2"))))
    assert(files.nonEmpty && files.forall(_.contains("k=2")), files.mkString(","))

    // update() after a late batch must also see partition columns
    spark.range(1000, 1100).select(col("id"), lit("9").as("k"), lit(7L).as("v"))
      .write.mode("append").partitionBy("k").parquet(path)
    StatsManifest.update(spark, path)
    val late = StatsManifest.readPruned(spark, path, Seq(("k", lit("9"), lit("9"))))
    assert(late.count() == 100)
    val lateFiles = StatsManifest.prunedFiles(spark, path, Seq(("k", lit("9"), lit("9"))))
    assert(lateFiles.nonEmpty && lateFiles.forall(_.contains("k=9")))
  }

  test("no manifest at all degrades to a full unpruned read") {
    val base = Files.createTempDirectory("graft_stats_none").toString
    val path = s"$base/t"
    spark.range(100).select(col("id"), (col("id") % 7).cast("string").as("k"))
      .write.parquet(path)
    val files = StatsManifest.prunedFiles(spark, path, Nil, Seq(("k", lit("3"))))
    assert(files.nonEmpty)
    val got = StatsManifest.readPruned(spark, path, Nil, Seq(("k", lit("3")))).count()
    assert(got == spark.read.parquet(path).where(col("k") === "3").count())
  }
}
