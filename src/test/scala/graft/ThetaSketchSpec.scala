package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analysis.Engagement
import graft.functions.ThetaSketchAgg._

/** Pins the theta-sketch family: exact-regime equality with true distinct
  * counts and true set operations (partitioning-independent), parquet
  * round-trip + union rollup without rescan, and bounded error in the
  * estimation regime — including the intersection HLL cannot provide.
  */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: estimates equal true distinct counts under any partitioning") {
    val rows = (1 to 5000).map(i => (s"d${i % 3}", (i % (400 + i % 3)).toLong))
    for (parts <- Seq(1, 13)) {
      val df = rows.toDF("dataset", "user").repartition(parts)
      val got = Engagement.thetaSketches(df, Seq(col("dataset")), col("user"))
        .select(col("dataset"), thetaEstimate(col("sketch")).as("est"))
        .as[(String, Double)].collect().toMap
      val want = rows.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).distinct.size.toDouble }
      assert(got == want, s"parts=$parts")
    }
  }

  test("overlap matrix matches exact intersections, differences and jaccard") {
    // d0: users 0..599; d1: 300..899; d2: 600..1199 — known overlaps
    val rows = Seq(("d0", 0, 600), ("d1", 300, 900), ("d2", 600, 1200))
      .flatMap { case (d, lo, hi) => (lo until hi).map(u => (d, u.toLong)) }
    val sk = Engagement.thetaSketches(rows.toDF("dataset", "user").repartition(7),
      Seq(col("dataset")), col("user"))
    val got = Engagement.overlapMatrix(sk, "dataset")
      .orderBy("slice_a", "slice_b")
      .select("slice_a", "slice_b", "n_a", "n_b", "n_both", "n_only_a", "jaccard")
      .as[(String, String, Double, Double, Double, Double, Double)].collect().toSeq
    val r6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    assert(got == Seq(
      ("d0", "d1", 600.0, 600.0, 300.0, 300.0, r6(300.0 / 900.0)),
      ("d0", "d2", 600.0, 600.0, 0.0, 600.0, 0.0),
      ("d1", "d2", 600.0, 600.0, 300.0, 300.0, r6(300.0 / 900.0))))
  }

  test("persisted sketches roll up by union without rescan and match direct sketches") {
    val rows = (1 to 4000).map(i => (s"d${i % 2}", s"w${i % 5}", (i % 700).toLong))
    val df = rows.toDF("dataset", "week", "user").repartition(9)
    val dir = Files.createTempDirectory("graft_theta").toString
    // persist per-(dataset, week) sketches; roll up to dataset from BYTES
    Engagement.thetaSketches(df, Seq(col("dataset"), col("week")), col("user"))
      .write.mode("overwrite").parquet(dir)
    val rolled = spark.read.parquet(dir)
      .groupBy(col("dataset"))
      .agg(thetaUnion(col("sketch")).as("sketch"))
      .select(col("dataset"), thetaEstimate(col("sketch")).as("est"))
      .as[(String, Double)].collect().toMap
    val want = rows.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._3).distinct.size.toDouble }
    assert(rolled == want)
  }

  test("sketch aggregates and set ops are callable from SQL") {
    (1 to 300).map(i => (s"d${i % 2}", (i % 80).toLong)).toDF("dataset", "user")
      .createOrReplaceTempView("theta_v")
    val got = spark.sql(
      """WITH sk AS (SELECT dataset, theta_sketch(user) AS s FROM theta_v GROUP BY dataset)
        |SELECT a.dataset, theta_estimate(a.s) AS n,
        |  theta_intersect(a.s, b.s) AS n_both, theta_difference(a.s, b.s) AS n_only
        |FROM sk a JOIN sk b ON a.dataset < b.dataset""".stripMargin)
      .as[(String, Double, Double, Double)].collect().toSeq
    // d0: evens+0 -> users {0,2,..78} plus odd wrap? i%2 alternates with i%80:
    // compute truth directly instead of reasoning about residues
    val rows = (1 to 300).map(i => (s"d${i % 2}", (i % 80).toLong))
    val sets = rows.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    val (s0, s1) = (sets("d0"), sets("d1"))
    assert(got == Seq(("d0", s0.size.toDouble,
      (s0 & s1).size.toDouble, (s0 -- s1).size.toDouble)))
    // union rollup from SQL over persisted-style bytes
    val uni = spark.sql(
      """SELECT theta_estimate(theta_union(s)) FROM
        |  (SELECT dataset, theta_sketch(user) AS s FROM theta_v GROUP BY dataset)""".stripMargin)
      .as[Double].head()
    assert(uni == (s0 ++ s1).size.toDouble)
    // quantile_sketch + heavy_hitters SQL surface
    val q = spark.sql(
      "SELECT quantile_sketch(CAST(user AS DOUBLE), 256, 0, 500, 1000) FROM theta_v")
      .as[Seq[Double]].head()
    assert(q.head == 0.0 && q.last == 79.0)
    val hh = spark.sql(
      "SELECT heavy_hitters(dataset, 16, 1) FROM theta_v").collect()
    assert(hh.length == 1)
  }

  test("streaming theta sketches equal the batch sketch per window") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_theta_stream").toString
    batch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = graft.streaming.Streams.thetaSketchStream(stream, col("user_id"), "ts")
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("theta_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("theta_out")
        .select(col("win_start"), thetaEstimate(col("sketch")))
        .orderBy("win_start").collect().toSeq
      val expected = graft.streaming.Streams.thetaSketchStream(batch, col("user_id"), "ts")
        .select(col("win_start"), thetaEstimate(col("sketch")))
        .orderBy("win_start").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
    } finally q.stop()
  }

  test("sf10 replica regime: sketch_distinct_users saturation error is a tested bound") {
    // SF10_PARITY_R11 recorded sketch_distinct_users diverging from the
    // exact oracle past saturation (~150k distinct users/type vs 65536
    // nominal entries, observed +0.56%). This pins that divergence as a
    // CONTRACT, not a narrative: at the replica's regime the relative
    // error must sit inside 3x the published theta RSE (1/sqrt(k-1) per
    // the DataSketches bound — RSE ~0.39% at k = 65536, 3x ~1.17%, the
    // 99.7% band; the
    // estimate is hash-deterministic, so this asserts the actual sf10-
    // regime behavior, not a flaky sample).
    import graft.functions.ThetaSketchAgg.{thetaSketch, thetaEstimate}
    val n = 150000L
    val k = 65536
    val est = spark.range(n).repartition(32)
      .agg(thetaSketch(col("id"), k).as("sk"))
      .select(thetaEstimate(col("sk"))).head().getDouble(0)
    val relErr = math.abs(est - n) / n.toDouble
    val bound = 3.0 / math.sqrt(k - 1.0)
    assert(relErr <= bound, f"saturated estimate $est%.0f vs $n: relErr=$relErr%.4f > 3*RSE=$bound%.4f")
    // and it IS past saturation (the exact regime would be bit-equal):
    assert(est != n.toDouble, "regime check: 150k distinct at k=65536 must be estimating")
  }

  test("estimation regime: single-sketch and intersection error stay bounded") {
    val n = 200000
    // two overlapping key ranges: A = [0, n), B = [n/2, 3n/2)
    val a = spark.range(n).select(lit("a").as("s"), col("id").as("user"))
    val b = spark.range(n / 2, n / 2 + n).select(lit("b").as("s"), col("id").as("user"))
    val sk = Engagement.thetaSketches(a.union(b).repartition(16), Seq(col("s")), col("user"))
    val m = Engagement.overlapMatrix(sk, "s").head
    val (nA, nB, nBoth) = (m.getDouble(2), m.getDouble(3), m.getDouble(4))
    // rse ~ 1/sqrt(4096) = 1.6% per sketch; allow 5% single, 10% compound
    assert(math.abs(nA - n) / n < 0.05, s"nA=$nA")
    assert(math.abs(nB - n) / n < 0.05, s"nB=$nB")
    assert(math.abs(nBoth - n / 2.0) / (n / 2.0) < 0.10, s"nBoth=$nBoth")
  }
}
