package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, SkewJoin}

class AdvancedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf attaches the latest right row at or before each left ts") {
    val left = Seq(
      (100L, "u1", ts("2024-01-01 10:00:00"), 5.0),
      (101L, "u1", ts("2024-01-01 12:00:00"), 6.0),
      (102L, "u2", ts("2024-01-01 09:00:00"), 7.0)
    ).toDF("event_id", "user", "ts", "value")
    val right = Seq(
      (1L, "u1", ts("2024-01-01 09:30:00"), 1.0),
      (2L, "u1", ts("2024-01-01 11:00:00"), 2.0),
      (3L, "u1", ts("2024-01-01 13:00:00"), 3.0)
    ).toDF("event_id", "user", "ts", "value")
    val got = AsOfJoin.asOf(left, right, "user", "ts", "ts", "event_id", Seq("value"))
      .select(col("event_id"), col("asof_value")).as[(Long, Option[Double])].collect().toMap
    assert(got == Map(100L -> Some(1.0), 101L -> Some(2.0), 102L -> None))
  }

  test("asOf matches equal timestamps inclusively and breaks right ties by tiebreak") {
    val left = Seq((100L, "u1", ts("2024-01-01 10:00:00"), 0.0)).toDF("event_id", "user", "ts", "value")
    val right = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00"), 1.0),
      (2L, "u1", ts("2024-01-01 10:00:00"), 2.0) // same ts, higher tiebreak wins
    ).toDF("event_id", "user", "ts", "value")
    val got = AsOfJoin.asOf(left, right, "user", "ts", "ts", "event_id", Seq("value"))
      .select("asof_value").as[Double].collect().toSeq
    assert(got == Seq(2.0))
  }

  test("olsByGroup recovers a known line") {
    // y = 2x + 1 exactly
    val df = (1 to 10).map(x => ("g", x, 2.0 * x + 1)).toDF("g", "x", "y")
    val got = graft.analysis.Regression.olsByGroup(df, Seq(col("g")), col("x"), col("y"))
      .select("slope", "intercept").as[(Double, Double)].collect().head
    assert(got == ((2.0, 1.0)))
  }

  test("olsImputedByGroup mean-imputes missing x without materializing it") {
    // observed x ∈ {1,2,3} (mean 2) on y = 2x+1; two extra rows with
    // missing x get x̂ = 2 — same as a literal impute-then-regress
    val df = Seq(
      ("g", Some(1), 3.0), ("g", Some(2), 5.0), ("g", Some(3), 7.0),
      ("g", None, 4.0), ("g", None, 6.0),
      ("allmiss", None, 1.0), ("allmiss", None, 2.0))
      .toDF("g", "x", "y")
    val got = graft.analysis.Regression.olsImputedByGroup(
        df, Seq(col("g")), col("x"), col("y"))
      .select("g", "n", "n_obs", "slope", "intercept")
      .as[(String, Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // literal imputed dataset: (1,3),(2,5),(3,7),(2,4),(2,6)
    val lit5 = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (2.0, 4.0), (2.0, 6.0))
    val n = lit5.size.toDouble
    val (sx, sy) = (lit5.map(_._1).sum, lit5.map(_._2).sum)
    val sxx = lit5.map(p => p._1 * p._1).sum
    val sxy = lit5.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(got("g")._2 == 5L && got("g")._3 == 3L)
    assert(got("g")._4.contains(math.rint(slope * 1e6) / 1e6))
    assert(got("g")._5.contains(math.rint(icept * 1e6) / 1e6))
    // a group with NO observed x has no mean to impute: NULL coefficients
    assert(got("allmiss")._4.isEmpty && got("allmiss")._5.isEmpty)
    // with no missing rows it degenerates to exactly the complete-case OLS
    val full = (1 to 10).map(x => ("h", x, 2.0 * x + 1)).toDF("g", "x", "y")
    val a = graft.analysis.Regression.olsImputedByGroup(full, Seq(col("g")), col("x"), col("y"))
      .select("slope", "intercept").as[(Double, Double)].collect().head
    assert(a == ((2.0, 1.0)))
  }

  test("saltedJoin equals the unsalted join") {
    val facts = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = facts.groupBy("user_id").agg(count(lit(1)).as("n"))
    val plain = facts.join(dim, Seq("user_id")).orderBy("event_id").collect().toSeq
    val salted = SkewJoin.saltedJoin(facts, dim, "user_id", col("event_id"), 8)
      .select(plain.head.schema.fieldNames.map(col): _*).orderBy("event_id").collect().toSeq
    assert(salted == plain)
  }

  test("skewSafeDistinctCount equals plain countDistinct") {
    val ev = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
    val plain = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n_distinct"))
      .as[(String, Long)].collect().toMap
    val safe = SkewJoin.skewSafeDistinctCount(ev, Seq(col("event_type")), col("user_id"), 8)
      .as[(String, Long)].collect().toMap
    assert(safe == plain)
  }

  test("TopKDoubles equals sort-based top-k") {
    val ev = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
    val fast = ev.groupBy("event_type")
      .agg(graft.functions.TopKAgg.topK(col("value"), 5).as("tv"))
      .as[(String, Seq[Double])].collect().toMap
    val slow = ev.groupBy("event_type")
      .agg(slice(reverse(array_sort(collect_list(col("value")))), 1, 5).as("tv"))
      .as[(String, Seq[Double])].collect().toMap
    assert(fast == slow)
  }

  test("minhashDedupVerified finds the planted near-dups with high jaccard") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
    val got = graft.dedup.Dedup.minhashDedupVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._3 >= 0.5))
  }

  test("statsApprox is within 5 percent of exact distinct counts") {
    val ev = GraftSession.table(spark, "/root/testdata/sf0.01", "events")
    val approx = graft.analysis.Engagement.statsApprox(ev, col("event_type"), col("user_id"))
      .select("event_type", "n_users_approx").as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("persisted HLL sketches roll up without rescanning and match exact counts") {
    val ev = GraftSession.table(spark, "/root/testdata/sf0.01", "events")
    val E = graft.analysis.Engagement
    // per (event_type, week) sketches — the slice a daily sync would persist
    val slices = E.distinctSketches(ev,
      Seq(col("event_type"), date_trunc("week", col("ts")).as("week")), col("user_id"))
    // parquet round-trip: the sketch is plain bytes, storable with the data
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    slices.write.mode("overwrite").parquet(dir)
    val restored = spark.read.parquet(dir)
    // rollup across weeks touches only sketch bytes, never the events table
    val est = E.rollupSketches(restored, Seq(col("event_type")))
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05, s"$k: est=${est(k)} exact=$n")
    }
    // merge consistency: slicing differently (by week only, then global)
    // unions to the same estimate as slicing by type-week then global —
    // union state is order/shape independent
    val globalA = E.rollupSketches(restored, Nil).as[Long].head()
    val globalB = E.rollupSketches(
      E.distinctSketches(ev, Seq(date_trunc("week", col("ts")).as("week")), col("user_id")),
      Nil).as[Long].head()
    assert(globalA == globalB)
    // two-hop rollup: week sketches -> per-type MERGED SKETCHES (the
    // re-persistable intermediate) -> global, without revisiting the
    // finest slices — must equal the one-hop union
    val byType = E.unionSketches(restored, Seq(col("event_type")))
    val globalC = E.rollupSketches(byType, Nil).as[Long].head()
    assert(globalC == globalA)
  }

  test("native as-of exec equals the composed as-of on real data") {
    val ev = GraftSession.table(spark, "/root/testdata/sf0.01", "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
    val composed = graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
      .orderBy("event_id").collect().toSeq
    val native = graft.plans.AsOfJoinNative.asOf(purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
      .orderBy("event_id").collect().toSeq
    assert(native == composed)
  }

  test("native as-of exec plan contains the custom operator and sorted exchanges") {
    val ev = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts", "value")
    val r = ev.filter(col("event_type") === "click")
    val p = graft.plans.AsOfJoinNative.asOf(l, r, "user_id", "ts", "ts", "event_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p)
    // SMJ-style contract: EnsureRequirements co-partitions both children on
    // the key (AQE may then coalesce both sides consistently)
    assert(p.contains("ENSURE_REQUIREMENTS"), p)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 2, p)
    assert(p.contains("Sort ["), p)
  }

  test("native as-of handles null keys and timestamps without matching or crashing") {
    val left = Seq(
      (100L, Some("u1"), Some(ts("2024-01-01 10:00:00")), 1.0),
      (101L, None, Some(ts("2024-01-01 10:00:00")), 2.0),
      (102L, Some("u1"), None, 3.0)
    ).toDF("event_id", "user", "ts", "value")
    val right = Seq(
      (1L, Some("u1"), Some(ts("2024-01-01 09:00:00")), 9.0),
      (2L, None, Some(ts("2024-01-01 09:00:00")), 8.0),
      (3L, Some("u1"), None, 7.0)
    ).toDF("event_id", "user", "ts", "value")
    val got = graft.plans.AsOfJoinNative.asOf(left, right, "user", "ts", "ts", "event_id", Seq("value"))
      .select(col("event_id"), col("asof_value")).as[(Long, Option[Double])].collect().toMap
    assert(got == Map(100L -> Some(9.0), 101L -> None, 102L -> None))
  }

  test("native as-of with string keys equals the composed as-of across many keys") {
    // generic (non-primitive) key path: carried key must be a private copy,
    // never an alias into sorter memory
    val left = (0 until 5000).map { i =>
      (i.toLong, s"user_${i % 97}", ts("2024-01-01 00:00:00").getTime + i * 61000L, i * 1.0)
    }.toDF("event_id", "user", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val right = (0 until 5000).map { i =>
      (10000L + i, s"user_${i % 101}", ts("2024-01-01 00:00:00").getTime + i * 59000L, i * 2.0)
    }.toDF("event_id", "user", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val composed = graft.operators.AsOfJoin.asOf(left, right, "user", "ts", "ts", "event_id", Seq("value"))
      .orderBy("event_id").collect().toSeq
    val native = graft.plans.AsOfJoinNative.asOf(left, right, "user", "ts", "ts", "event_id", Seq("value"))
      .orderBy("event_id").collect().toSeq
    assert(native == composed)
  }

  test("native as-of handles a payload containing the key and rejects asof_* clashes") {
    val left = Seq((100L, "u1", ts("2024-01-01 10:00:00"), 1.0))
      .toDF("event_id", "user", "ts", "value")
    val right = Seq((1L, "u1", ts("2024-01-01 09:00:00"), 9.0))
      .toDF("event_id", "user", "ts", "value")
    // payload includes the join key: must emit asof_user like the composed join
    val got = graft.plans.AsOfJoinNative
      .asOf(left, right, "user", "ts", "ts", "event_id", Seq("user", "value"))
      .select(col("event_id"), col("asof_user"), col("asof_value"))
      .as[(Long, String, Double)].head()
    assert(got == ((100L, "u1", 9.0)))
    // a left column named asof_value would silently duplicate — fail fast
    val clashing = left.withColumn("asof_value", lit(0.0))
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinNative.asOf(clashing, right, "user", "ts", "ts", "event_id", Seq("value"))
    }
    assert(e.getMessage.contains("asof_"), e.getMessage)
    // a typo'd left-ts names the column and the candidates instead of None.get
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinNative.asOf(left, right, "user", "no_such_ts", "ts", "event_id", Seq("value"))
    }
    assert(e2.getMessage.contains("no_such_ts") && e2.getMessage.contains("user"), e2.getMessage)
  }

  test("SQL size parameters reject non-positive literals at analysis time") {
    for (sql <- Seq(
        "SELECT distinct_shingles(text, 0) FROM documents",
        "SELECT bottomk_fingerprint(text, 3, 0) FROM documents",
        "SELECT bottomk_fingerprint(text, 0, 4) FROM documents")) {
      GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
        .createOrReplaceTempView("documents")
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(">= 1"), s"$sql -> ${e.getMessage}")
    }
  }

  test("native as-of rejects non-timestamp ts columns at plan time") {
    val left = Seq((1L, "u1", 5, 1.0)).toDF("event_id", "user", "ts", "value") // ts is INT
    val right = Seq((2L, "u1", 3, 2.0)).toDF("event_id", "user", "ts", "value")
    val e = intercept[Exception] {
      graft.plans.AsOfJoinNative.asOf(left, right, "user", "ts", "ts", "event_id", Seq("value")).collect()
    }
    assert(e.getMessage.contains("must be TIMESTAMP or BIGINT"), e.getMessage)
  }

  test("OLS emits null slope for constant-x groups instead of NaN") {
    val df = Seq(("g", 5, 1.0), ("g", 5, 2.0)).toDF("g", "x", "y")
    val row = graft.analysis.Regression.olsByGroup(df, Seq(col("g")), col("x"), col("y")).head()
    assert(row.isNullAt(row.fieldIndex("slope")))
    assert(row.isNullAt(row.fieldIndex("intercept")))
  }

  test("ols2ByGroup recovers a known plane") {
    // y = 2*x1 + 3*x2 + 1 exactly, non-collinear design
    val rows = for (x1 <- 1 to 6; x2 <- 1 to 4) yield ("g", x1, x2, 2.0 * x1 + 3.0 * x2 + 1)
    val df = rows.toDF("g", "x1", "x2", "y")
    val r = graft.analysis.Regression.ols2ByGroup(df, Seq(col("g")), col("x1"), col("x2"), col("y"))
      .select("b1", "b2", "b0").as[(Double, Double, Double)].collect().head
    assert(r == ((2.0, 3.0, 1.0)))
  }

  test("OLS null guard also catches fractional constant-x designs") {
    // sx=0.3, sxx=0.03: exact in decimal but leaves ~1e-18 residue in double
    val df = Seq(("g", 0.10, 1.0), ("g", 0.10, 2.0), ("g", 0.10, 3.0)).toDF("g", "x", "y")
    val row = graft.analysis.Regression.olsByGroup(df, Seq(col("g")), col("x"), col("y")).head()
    assert(row.isNullAt(row.fieldIndex("slope")))
  }
}
