package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.QuantileSketchAgg.quantiles
import graft.streaming.Streams

/** Pins the streaming-histogram quantile aggregate: exact-regime equality
  * with the nearest-rank quantiles (merge-order independent), bounded rank
  * error in the approximation regime, null/NaN hygiene, and the streaming
  * twin's batch equivalence across genuine micro-batch state round-trips.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Exact nearest-rank (lower) quantile with the shared integer per-mille
    * rank formula — the spec-side oracle. */
  private def exactQ(sorted: IndexedSeq[Double], qPerMille: Int): Double = {
    val n = sorted.length.toLong
    val rank = math.max(1L, (qPerMille.toLong * n + 999L) / 1000L)
    sorted((rank - 1).toInt)
  }

  private def sketchQs(df: org.apache.spark.sql.DataFrame, cap: Int,
                       qs: Seq[Int]): Seq[Double] =
    df.agg(quantiles(col("v"), cap, qs).as("q"))
      .select(explode(col("q"))).as[Double].collect().toSeq

  test("exact regime: capacity >= distinct values gives exact nearest-rank quantiles") {
    // 400 rows over 37 distinct values, duplicated unevenly
    val vals = (1 to 400).map(i => (i % 37).toDouble * 1.5 - 7.0)
    val df = vals.toDF("v")
    val qs = Seq(0, 250, 500, 750, 950, 1000)
    val sorted = vals.sorted.toIndexedSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = sketchQs(df.repartition(parts), cap = 64, qs)
      val want = qs.map(exactQ(sorted, _))
      assert(got == want, s"parts=$parts: $got != $want")
    }
  }

  test("q=0 is the minimum, q=1000 the maximum") {
    val df = Seq(5.0, -3.5, 12.25, 0.0).toDF("v").repartition(3)
    assert(sketchQs(df, 16, Seq(0, 1000)) == Seq(-3.5, 12.25))
  }

  test("nulls and NaNs are ignored; an empty group evaluates to null") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0), Some(2.0))
      .toDF("v").repartition(2)
    assert(sketchQs(df, 16, Seq(500)) == Seq(2.0))
    val empty = df.filter(col("v") > 100)
      .agg(quantiles(col("v"), 16, Seq(500)).as("q"))
    assert(empty.collect().head.isNullAt(0))
  }

  test("approximation regime: rank error stays small under many-partition merges") {
    // seeded uniform stream, far more distinct values than capacity
    val rnd = new scala.util.Random(42)
    val n = 20000
    val vals = IndexedSeq.fill(n)(rnd.nextDouble() * 1000.0)
    val df = vals.toDF("v").repartition(32)
    val qs = Seq(100, 250, 500, 750, 900)
    val got = sketchQs(df, cap = 128, qs)
    val sorted = vals.sorted
    qs.zip(got).foreach { case (q, est) =>
      // true rank of the estimate = #values <= est; target rank = q‰ of n
      val trueRank = sorted.count(_ <= est).toLong
      val target = math.max(1L, (q.toLong * n + 999L) / 1000L)
      val err = math.abs(trueRank - target).toDouble / n
      assert(err <= 0.05, s"q=$q: estimate $est has rank error $err > 5%")
    }
  }

  test("grouped exact regime matches per-group exact quantiles") {
    val rows = (1 to 900).map(i => (s"g${i % 3}", (i % (20 + i % 3)).toDouble))
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy(col("g"))
      .agg(quantiles(col("v"), 64, Seq(500, 950)).as("q"))
      .select(col("g"), element_at(col("q"), 1).as("p50"), element_at(col("q"), 2).as("p95"))
      .as[(String, Double, Double)].collect().toSeq.sorted
    val want = rows.groupBy(_._1).toSeq.map { case (g, rs) =>
      val sorted = rs.map(_._2).sorted.toIndexedSeq
      (g, exactQ(sorted, 500), exactQ(sorted, 950))
    }.sorted
    assert(got == want)
  }

  test("streaming quantiles equal the batch sketch per window across micro-batches") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_qs_stream").toString
    // several files + maxFilesPerTrigger=1 => several micro-batches, so the
    // sketch buffer genuinely round-trips the state store between batches
    batch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Streams.quantilesStream(stream, col("value"), "ts")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("qs_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("qs_out")
        .orderBy("win_start", "q").collect().toSeq
      // withWatermark is a no-op in batch, so the same code is the oracle
      val expected = Streams.quantilesStream(batch, col("value"), "ts")
        .orderBy("win_start", "q").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
    } finally q.stop()
  }
}
