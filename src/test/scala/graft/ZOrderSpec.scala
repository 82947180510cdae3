package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Proves the Z-order layout path: the Morton interleave is the textbook
  * bit-spread, and a z-clustered table's per-file min/max rectangles are
  * tight on BOTH columns — a box-bounded scan prunes to fewer candidate
  * files than the 1-D range layout can offer the orthogonal dimension.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("mortonInterleave matches hand-computed bit interleaves") {
    // z(x, y): bit i of x -> 2i, bit i of y -> 2i+1
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (3L, 0L), (0L, 3L), (5L, 3L), (12345L, 54321L), (0xFFFFL, 0xFFFFL))
    val df = cases.toDF("x", "y")
    val got = df.select(Sources.mortonInterleave(col("x"), col("y"), 16)).as[Long].collect().toSeq
    val want = cases.map { case (x, y) =>
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    }
    assert(got == want)
    // spot-check by hand: z(1,0)=1; z(5,3) interleaves 101/011 -> 011011 = 27
    assert(want(1) == 1L && want(6) == 27L && want(8) == 0xFFFFFFFFL)
  }

  test("linearBucket clamps, handles nulls and degenerate ranges") {
    val df = Seq(Some(-5.0), Some(0.0), Some(50.0), Some(100.0), Some(105.0), None).toDF("v")
    val got = df.select(Sources.linearBucket(col("v"), lit(0.0), lit(100.0), 4)).as[Long].collect().toSeq
    // 4 bits -> [0, 15]; -5 clamps to 0, 105 clamps to 15, null -> 0
    assert(got == Seq(0L, 0L, 7L, 15L, 15L, 0L))
    val degen = df.select(Sources.linearBucket(col("v"), lit(9.0), lit(9.0), 4)).as[Long].collect().toSeq
    assert(degen.forall(_ == 0L))
  }

  test("z-order layout prunes a 2-D box query to fewer files than a 1-D range layout") {
    val n = 128
    // uniform 128x128 grid of (x, y) points
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).cast("double").as("x"),
      (col("id") / n).cast("double").as("y"),
      col("id").as("payload"))

    val base = Files.createTempDirectory("graft_zorder").toString
    // 64 files, not 16: a z-file that straddles a major quadrant boundary
    // has a near-global min/max rectangle, and with only 16 files the up
    // to 3 structural straddlers plus the true corner file can TIE the
    // range layout's 4 corner slices (observed in-suite, r14). At 64
    // files the straddler count stays ~3 while the range layout's corner
    // slice count grows to ~16 — the comparison margin is structural.
    Sources.writeZOrderLayout(grid, s"$base/z", "x", "y", 64)
    Sources.writeRangeLayout(grid, s"$base/r", "x", 64)

    def candidateFiles(path: String): (Int, Int) = {
      val back = spark.read.parquet(path)
      assert(back.count() == n.toLong * n)
      val files = back.inputFiles
      assert(files.length > 8, files.mkString(","))
      // a file is a pruning candidate iff its (x, y) min/max rectangle
      // intersects the corner box x < 32, y < 32 — exactly the footer-stats
      // decision a parquet reader makes
      (files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head
        r.getDouble(0) < 32.0 && r.getDouble(2) < 32.0
      }, files.length)
    }

    val (zCand, zFiles) = candidateFiles(s"$base/z")
    val (rCand, _) = candidateFiles(s"$base/r")
    // the x-range layout slices x only: every file containing x < 32 spans
    // all of y, so the box query cannot prune on y at all. The z layout's
    // files are compact rectangles; only those near the corner qualify.
    assert(zCand < rCand,
      s"z-order candidates $zCand must beat 1-D range candidates $rCand")
    // and the z layout must actually prune: the corner box is 1/16 of the
    // z key space, so well under half the files may qualify. The bound is
    // RELATIVE (≤ ⅓ of the files), not an absolute count: the range
    // partitioner places split points by reservoir sampling, so per-file
    // z-extents jitter run to run — an absolute "≤ 4 of ~16" flaked
    // in-suite (r14) whenever sampling handed a corner-adjacent file a
    // wider extent.
    assert(zCand <= zFiles / 3,
      s"corner box should touch few z files, got $zCand of $zFiles")

    // correctness: the box read returns identical rows from both layouts
    val boxZ = spark.read.parquet(s"$base/z").filter(col("x") < 32 && col("y") < 32)
      .orderBy("payload").collect().toSeq
    val boxR = spark.read.parquet(s"$base/r").filter(col("x") < 32 && col("y") < 32)
      .orderBy("payload").collect().toSeq
    assert(boxZ == boxR && boxZ.size == 32 * 32)
  }
}
