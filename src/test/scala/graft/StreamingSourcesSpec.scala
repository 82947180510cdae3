package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.{SessionEvent, SessionUpdate}

class StreamingSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming tumbling window agg equals the batch twin") {
    // feed the batch events table through a file stream
    val batch = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_stream").toString
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = Streams.tumblingCounts(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("hour", "event_type").collect().toSeq
      val expected = SparkEntry.queries("tumbling_window_agg")(spark, sfDir)
        .orderBy("hour", "event_type").collect().toSeq
      assert(streamed == expected)
    } finally q.stop()
  }

  test("streaming heavy hitters equals the batch sketch per window") {
    val batch = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_hh_stream").toString
    // several files + maxFilesPerTrigger=1 => several micro-batches, so the
    // sketch buffer genuinely round-trips the state store between batches
    batch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Streams.heavyHittersStream(stream, col("event_type"), "ts")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hh_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hh_out")
        .orderBy("win_start", "rank").collect().toSeq
      // withWatermark is a no-op in batch, so the same code is the oracle
      val expected = Streams.heavyHittersStream(batch, col("event_type"), "ts")
        .orderBy("win_start", "rank").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
    } finally q.stop()
  }

  test("streaming PSI drift equals the batch psi_drift on the same rows") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // first half (the baseline) draws 1..40, second half shifts upward;
    // the batch midpoint lands between the two instants
    val half1 = (1 to 40).map(i => (ts("2024-01-01 00:00:00"), i.toDouble))
    val half2 = (1 to 40).map(i => (ts("2024-01-03 00:00:00"), 20.0 + i))
    val full = (half1 ++ half2).toDF("ts", "v").repartition(4)
    val batchPsi = graft.analysis.Stats.psiDrift(full, col("ts"), col("v"), 10)
      .collect().head
    val (edges, baseP) = graft.analysis.Stats.psiBaseline(
      half1.toDF("ts", "v"), col("v"), 10)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    input.addData(half2: _*)
    val q = Streams.psiDriftStream(input.toDF.toDF("ts", "v"), "ts", col("v"),
        edges, baseP, windowLen = "1 day")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("psi_out").start()
    try {
      q.processAllAvailable()
      val win = spark.table("psi_out").collect()
      assert(win.length === 1)
      assert(win.head.getAs[Long]("n") === 40)
      // bit-equal to the batch plan's psi over the identical halves
      assert(win.head.getAs[Double]("psi") === batchPsi.getAs[Double]("psi"))
      assert(win.head.getAs[Boolean]("shifted") === batchPsi.getAs[Boolean]("shifted"))
    } finally q.stop()
  }

  test("streaming window sample equals the batch bottom-k per window") {
    val batch = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_sample_stream").toString
    // several files + maxFilesPerTrigger=1 => the k-pair buffer round-trips
    // the state store between micro-batches
    batch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Streams.sampleStream(stream, col("event_id"), "ts", k = 5)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("sample_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sample_out")
        .orderBy("win_start", "rank").collect().toSeq
      val expected = Streams.sampleStream(batch, col("event_id"), "ts", k = 5)
        .orderBy("win_start", "rank").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
    } finally q.stop()
  }

  test("native session windows on a stream equal the batch sessions once closed") {
    val batch = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_sw_stream").toString
    batch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // watermark longer than the data's whole span: unordered file delivery
    // can then never late-drop a row; every session closes only when the
    // far-future sentinel advances the watermark past it
    val q = graft.streaming.Streams.sessionWindowStream(stream, "ts",
        watermark = "45 days")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sw_out").start()
    try {
      q.processAllAvailable()
      // append mode only emits sessions the watermark has CLOSED, and the
      // watermark advances at the END of a batch — push a far-future
      // sentinel row (user -1) so a final trigger flushes every real session
      val sentinel = batch.limit(1)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      sentinel.write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("sw_out").filter(col("user_id") =!= -1L)
        .orderBy("user_id", "win_start").collect().toSeq
      val expected = SparkEntry.queries("session_window_agg")(spark, sfDir)
        .orderBy("user_id", "win_start").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
    } finally q.stop()
  }

  test("stateful sessionization matches the batch sessionizer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Streams.sessionize(input.toDS(), 1800L)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("sessions_out").start()
    try {
      val events = GraftSession.table(spark, sfDir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .as[SessionEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      // two micro-batches to prove state carries across batches
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()

      val streamed = spark.table("sessions_out").as[SessionUpdate].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.last }
        .values.map(r => (r.user_id, r.n_sessions, r.n_events)).toSet
      val expected = SparkEntry.queries("sessionize")(spark, sfDir)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("streaming CUSUM carries drift state across micro-batches, equals batch") {
    import graft.streaming.Streams.{DriftEvent, DriftOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DriftEvent]
    val q = graft.streaming.Streams.cusumStream(input.toDS(), 150.0, 500.0)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cusum_out").start()
    try {
      val events = GraftSession.table(spark, sfDir, "events")
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .as[DriftEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      // two micro-batches to prove the drift statistic round-trips state
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("cusum_out").as[DriftOut].collect()
        .map(o => (o.user_id, o.event_id, o.value, o.cusum, o.alarm)).toSet
      val expected = SparkEntry.queries("cusum_drift")(spark, sfDir)
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      assert(streamed.nonEmpty && streamed == expected)
    } finally q.stop()
  }

  test("streaming Holt smoother carries (level, trend) state, equals batch") {
    import graft.streaming.Streams.{DriftEvent, HoltOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DriftEvent]
    val q = graft.streaming.Streams.holtStream(input.toDS(), 0.5, 0.25)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("holt_out").start()
    try {
      val events = GraftSession.table(spark, sfDir, "events")
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .as[DriftEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      // two micro-batches: both state doubles must round-trip the store
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("holt_out").as[HoltOut].collect()
        .map(o => (o.user_id, o.event_id, o.value, o.level, o.trend, o.forecast))
        .toSet
      val expected = SparkEntry.queries("holt_linear")(spark, sfDir)
        .as[(Long, Long, Double, Double, Double, Double)].collect().toSet
      assert(streamed.nonEmpty && streamed == expected)
    } finally q.stop()
  }

  test("streaming as-of enrichment matches the batch as-of join") {
    import graft.streaming.Streams.{EnrichEvent, EnrichOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EnrichEvent]
    val q = Streams.asOfEnrich(input.toDS())
      // Append: the operator declares append semantics (rows are final),
      // which is what lets it feed file sinks in production
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_out").start()
    try {
      val ev = GraftSession.table(spark, sfDir, "events")
      val tagged = ev.filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("ts"), col("event_id"),
          (col("event_type") === "purchase").as("is_left"), col("value"))
        .as[EnrichEvent].collect()
        // right-before-left at equal ts, so the mid-array split can never
        // separate a same-timestamp click from the purchase that needs it
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.is_left, e.event_id))
      // split mid-stream: the carried right row must survive the batch gap
      val (first, second) = tagged.splitAt(tagged.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("asof_out").as[EnrichOut].collect()
        .map(o => (o.event_id, o.asof_ts.map(_.getTime), o.asof_value)).toSet
      val expected = SparkEntry.queries("asof_join")(spark, sfDir)
        .select(col("event_id"), col("click_ts"), col("click_value")).collect()
        .map(r => (r.getLong(0),
          Option(r.getTimestamp(1)).map(_.getTime),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("as-of enrichment orders pre-epoch fractional seconds correctly") {
    import graft.streaming.Streams.{EnrichEvent, EnrichOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 1969-12-31T23:59:59.500 is BEFORE epoch: truncating division would
    // compute its micros one second high (+0.5s) and refuse the match
    val preEpoch = new java.sql.Timestamp(-500L)
    val epoch = new java.sql.Timestamp(0L)
    val input = MemoryStream[EnrichEvent]
    val q = Streams.asOfEnrich(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_pre_epoch").start()
    try {
      input.addData(Seq(
        EnrichEvent(1L, preEpoch, 1L, is_left = false, 9.0),  // right, t=-0.5s
        EnrichEvent(1L, epoch, 2L, is_left = true, 1.0)))     // left,  t=0
      q.processAllAvailable()
      val got = spark.table("asof_pre_epoch").as[EnrichOut].collect()
      assert(got.length == 1 && got.head.asof_value == Some(9.0),
        s"pre-epoch right row must match the epoch left row: ${got.toSeq}")
    } finally q.stop()
  }

  test("evicting sessionizer drops idle state; a returning user starts fresh") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(user: Long, min: Int, id: Long) =
      SessionEvent(user, java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), id)
    val input = MemoryStream[SessionEvent]
    val q = Streams.sessionizeEvicting(input.toDS(), gapSeconds = 600L, watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("evict_sessions").start()
    try {
      input.addData(ev(1L, 0, 1), ev(1L, 5, 2)) // one session, 2 events
      q.processAllAvailable()
      // another user far in the future pushes the watermark past user 1's
      // timeout (10:05 + 10 min gap) -> user 1's state is evicted
      input.addData(ev(2L, 50, 3))
      q.processAllAvailable()
      // user 1 returns: with state evicted, counters start fresh (the gap
      // had passed anyway, so the session count is still correct at 1)
      input.addData(ev(1L, 55, 4))
      q.processAllAvailable()
      val updates = spark.table("evict_sessions")
        .as[SessionUpdate].collect().filter(_.user_id == 1L)
      assert(updates.head == SessionUpdate(1L, 1L, 2L))
      assert(updates.last == SessionUpdate(1L, 1L, 1L),
        "post-eviction return must restart counters (state was dropped)")
    } finally q.stop()
  }

  test("evicting Holt smoother drops idle state; a returning entity re-seeds") {
    import graft.streaming.Streams.{DriftEvent, HoltOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(user: Long, min: Int, id: Long, v: Double) =
      DriftEvent(user, java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), id, v)
    val input = MemoryStream[DriftEvent]
    val q = Streams.holtStreamEvicting(input.toDS(), 0.5, 0.25,
      idleSeconds = 600L, watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("evict_holt").start()
    try {
      input.addData(ev(1L, 0, 1, 10.0), ev(1L, 5, 2, 20.0))
      q.processAllAvailable()
      // a second entity far in the future pushes the watermark past
      // entity 1's timeout (10:05 + 10 min) -> its (level, trend) drops
      input.addData(ev(2L, 50, 3, 5.0))
      q.processAllAvailable()
      // entity 1 returns: re-seeded (level = first value, trend = 0),
      // NOT the pre-idle recursion (which had level 15, trend 1.25)
      input.addData(ev(1L, 55, 4, 40.0))
      q.processAllAvailable()
      val mine = spark.table("evict_holt").as[HoltOut].collect()
        .filter(_.user_id == 1L).sortBy(_.event_id)
      assert(mine.map(o => (o.event_id, o.level, o.trend)).toSeq ===
        Seq((1L, 10.0, 0.0), (2L, 15.0, 1.25), (4L, 40.0, 0.0)),
        s"got ${mine.toSeq}")
    } finally q.stop()
  }

  test("evicting CUSUM drops idle state; the statistic re-accumulates from zero") {
    import graft.streaming.Streams.{DriftEvent, DriftOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(user: Long, min: Int, id: Long, v: Double) =
      DriftEvent(user, java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), id, v)
    val input = MemoryStream[DriftEvent]
    // k = 0: s accumulates raw values, alarm at 30
    val q = Streams.cusumStreamEvicting(input.toDS(), 0.0, 30.0,
      idleSeconds = 600L, watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("evict_cusum").start()
    try {
      input.addData(ev(1L, 0, 1, 20.0), ev(1L, 5, 2, 5.0)) // s = 20, 25
      q.processAllAvailable()
      input.addData(ev(2L, 50, 3, 1.0)) // watermark passes 10:15 -> evict
      q.processAllAvailable()
      // with carried state (25) this 10.0 would alarm at 35; evicted
      // state restarts at 0 -> s = 10, no alarm: the documented re-warm-up
      input.addData(ev(1L, 55, 4, 10.0))
      q.processAllAvailable()
      val mine = spark.table("evict_cusum").as[DriftOut].collect()
        .filter(_.user_id == 1L).sortBy(_.event_id)
      assert(mine.map(o => (o.event_id, o.cusum, o.alarm)).toSeq ===
        Seq((1L, 20.0, false), (2L, 25.0, false), (4L, 10.0, false)),
        s"got ${mine.toSeq}")
    } finally q.stop()
  }

  test("evicting drift variants equal their namesakes when nothing idles out") {
    import graft.streaming.Streams.{DriftEvent, DriftOut, HoltOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = GraftSession.table(spark, sfDir, "events")
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[DriftEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = events.splitAt(events.length / 2)
    // horizon far past the fixture's span, zero-delay watermark: no key
    // ever times out and no row is late, so the shared fold must produce
    // byte-identical output to the NoTimeout variants (and, transitively,
    // to the batch operators those are spec-pinned against)
    val horizon = 10L * 365 * 24 * 3600
    val inH = MemoryStream[DriftEvent]
    val qh = Streams.holtStreamEvicting(inH.toDS(), 0.5, 0.25, horizon, "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("evict_holt_eq").start()
    val inC = MemoryStream[DriftEvent]
    val qc = Streams.cusumStreamEvicting(inC.toDS(), 150.0, 500.0, horizon, "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("evict_cusum_eq").start()
    try {
      inH.addData(first.toIndexedSeq); qh.processAllAvailable()
      inH.addData(second.toIndexedSeq); qh.processAllAvailable()
      inC.addData(first.toIndexedSeq); qc.processAllAvailable()
      inC.addData(second.toIndexedSeq); qc.processAllAvailable()
      val holt = spark.table("evict_holt_eq").as[HoltOut].collect()
        .map(o => (o.user_id, o.event_id, o.value, o.level, o.trend, o.forecast)).toSet
      val holtBatch = SparkEntry.queries("holt_linear")(spark, sfDir)
        .as[(Long, Long, Double, Double, Double, Double)].collect().toSet
      assert(holt.nonEmpty && holt == holtBatch)
      val cusum = spark.table("evict_cusum_eq").as[DriftOut].collect()
        .map(o => (o.user_id, o.event_id, o.value, o.cusum, o.alarm)).toSet
      val cusumBatch = SparkEntry.queries("cusum_drift")(spark, sfDir)
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      assert(cusum.nonEmpty && cusum == cusumBatch)
    } finally { qh.stop(); qc.stop() }
  }

  test("incremental watermark reads only new rows and advances") {
    val ev = GraftSession.table(spark, sfDir, "events")
    val w0 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val slice = graft.sources.Sources.readIncremental(ev, col("ts"), w0)
    assert(slice.count() > 0)
    assert(slice.agg(min(col("ts"))).head.getTimestamp(0).after(w0))
    val w1 = graft.sources.Sources.nextWatermark(slice, col("ts")).get
    assert(graft.sources.Sources.readIncremental(ev, col("ts"), w1).count() == 0)
  }

  test("stream-static dim enrichment stays stateless and matches the batch join") {
    // enrich a message stream with a slowly-changing dimension (code schemes,
    // contact attributes): stream-static joins re-plan the static side per
    // micro-batch — no state store, no watermark needed
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold")).toDF("tier_id", "tier")
    val ms = MemoryStream[(Long, Long)]
    val joined = ms.toDF().toDF("event_id", "tier_id").join(dim, "tier_id")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    ms.addData((10L, 0L), (11L, 2L))
    q.processAllAvailable()
    ms.addData((12L, 1L), (13L, 9L)) // 9 has no dim row: inner join drops it
    q.processAllAvailable()
    val got = spark.table("enriched").collect()
      .map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    q.stop()
    assert(got.toSeq == Seq((10L, "bronze"), (11L, "gold"), (12L, "silver")))
  }

  test("streaming target encoder joins the trained table stateless; unseen falls back") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("cat", "y")
    val table = graft.analysis.Stats.targetEncodeTable(train, col("cat"), col("y"))
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.targetEncodeStream(
        ms.toDF().toDF("id", "c"), col("c"), table, globalMean = 4.0 / 3.0)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("te_out").start()
    try {
      ms.addData((1L, "a"), (2L, "b"), (3L, "zzz"))
      q.processAllAvailable()
      val got = spark.table("te_out").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Double]("te")).toMap
      assert(got(1L) === 2.0)       // mean of category a
      assert(got(2L) === 10.0)      // mean of category b
      assert(got(3L) === 1.333333)  // unseen -> r6'd global mean
      assert(q.lastProgress.stateOperators.isEmpty) // stateless plan
    } finally q.stop()
  }

  test("foreachBatch CDC merge materializes latest state; redelivery is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val target = Files.createTempDirectory("graft_cdc").toString + "/t"
    def merge(batch: org.apache.spark.sql.DataFrame): Unit =
      graft.sources.Sources.mergeCdcBatch(spark, target, batch,
        col("op") === "D", Seq(col("id")), col("v"), col("payload"))
    val ms = MemoryStream[(String, Long, String, String)]
    val q = ms.toDF().toDF("id", "v", "payload", "op")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        merge(batch)
      }.start()
    // batch 1: three inserts; batch 2: update u1, tombstone u2, insert u4
    ms.addData(("u1", 1L, "a", "U"), ("u2", 1L, "b", "U"), ("u3", 1L, "c", "U"))
    q.processAllAvailable()
    val b2 = Seq(("u1", 2L, "a2", "U"), ("u2", 2L, "x", "D"), ("u4", 2L, "d", "U"))
    ms.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def state() = spark.read.parquet(target).select("id", "payload")
      .as[(String, String)].collect().toMap
    val expected = Map("u1" -> "a2", "u3" -> "c", "u4" -> "d")
    assert(state() == expected)
    // at-least-once: re-delivering batch 2 cannot change the winners
    merge(b2.toDF("id", "v", "payload", "op"))
    assert(state() == expected)
  }

  test("foreachBatch + origin-key dedup makes re-delivered batches no-ops") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val target = Files.createTempDirectory("graft_upsert").toString + "/t"
    def runOnce(): Unit = {
      // a fresh MemoryStream with NO checkpoint reuse: the second run
      // re-delivers the same rows — the at-least-once worst case
      val ms = MemoryStream[(Long, String)]
      val q = ms.toDF().toDF("origin_id", "payload")
        .writeStream.outputMode(OutputMode.Append)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.sources.Sources.appendDeduped(batch, target, "origin_id")
        }.start()
      ms.addData((1L, "a"), (2L, "b"), (2L, "b")) // in-batch repeat too
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    assert(spark.read.parquet(target).count() == 2)
    runOnce() // full re-delivery: nothing new may land
    val rows = spark.read.parquet(target).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("appendDeduped blocks null-keyed re-inserts too (null-safe anti join)") {
    val target = Files.createTempDirectory("graft_upsert_null").toString + "/t"
    val batch = Seq((Some(1L), "a"), (None, "unkeyed")).toDF("origin_id", "payload")
    graft.sources.Sources.appendDeduped(batch, target, "origin_id")
    assert(spark.read.parquet(target).count() == 2)
    // redelivery: an === anti join would re-insert the null-keyed row forever
    graft.sources.Sources.appendDeduped(batch, target, "origin_id")
    assert(spark.read.parquet(target).count() == 2)
  }

  test("run-event log file names cannot alias across (run, event) pairs") {
    val dir = Files.createTempDirectory("graft_runlog_amb").toString
    val t0 = java.time.Instant.parse("2024-02-01T00:00:00Z")
    // sanitize-then-join would map both of these to "run_1_end.json"
    graft.sources.Sources.logRunEvent(spark, dir, "p", "run_1", "end", t0)
    graft.sources.Sources.logRunEvent(spark, dir, "p", "run", "1_end", t0.plusSeconds(5))
    val got = graft.sources.Sources.readRunEvents(spark, dir)
      .select("run_id", "event").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("run_1", "end"), ("run", "1_end")))
  }

  test("run-event file names encode per UTF-8 byte so wide chars cannot alias ASCII") {
    val dir = Files.createTempDirectory("graft_runlog_utf").toString
    val t0 = java.time.Instant.parse("2024-02-01T00:00:00Z")
    // a per-CHAR %-encoding with no fixed width maps em dash U+2014 and the
    // three ASCII chars " 14" to the same "%2014" — per-byte %XX cannot
    graft.sources.Sources.logRunEvent(spark, dir, "p", "—", "end", t0)
    graft.sources.Sources.logRunEvent(spark, dir, "p", " 14", "end", t0.plusSeconds(5))
    val got = graft.sources.Sources.readRunEvents(spark, dir)
      .select("run_id").collect().map(_.getString(0)).toSet
    assert(got == Set("—", " 14"))
  }

  test("readRunEvents returns an empty frame before any event is logged") {
    val missing = Files.createTempDirectory("graft_runlog_missing").toString + "/never_created"
    assert(graft.sources.Sources.readRunEvents(spark, missing).count() == 0)
    val empty = Files.createTempDirectory("graft_runlog_empty").toString
    assert(graft.sources.Sources.readRunEvents(spark, empty).count() == 0)
  }

  test("a runId starting with '.' cannot produce a hidden (silently dropped) event file") {
    val dir = Files.createTempDirectory("graft_runlog_dot").toString
    val t0 = java.time.Instant.parse("2024-02-01T00:00:00Z")
    graft.sources.Sources.logRunEvent(spark, dir, "p", ".hidden_run", "start", t0)
    // an interior dot keeps its identity (idempotent retry still overwrites)
    graft.sources.Sources.logRunEvent(spark, dir, "p", "v1.2", "start", t0)
    graft.sources.Sources.logRunEvent(spark, dir, "p", "v1.2", "start", t0.plusSeconds(5))
    val got = graft.sources.Sources.readRunEvents(spark, dir)
      .select("run_id").collect().map(_.getString(0)).toSeq
    assert(got.count(_ == ".hidden_run") == 1)
    assert(got.count(_ == "v1.2") == 1)
  }

  test("offline-trained perplexity cuts apply to a stream and match the batch buckets") {
    val L = graft.text.LangModel
    val d = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
    val scored = L.bigramScore(d, col("doc_id"), col("text"))
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source").as("slice"), col("lm_nll").as("score"))
    // calibrate OFFLINE (this frame would be persisted in production)
    val cuts = L.scoreCuts(scored, col("slice"), col("score"))
    val expected = L.perplexityBuckets(scored, col("doc_id"), col("slice"), col("score"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    // apply ONLINE: scored docs stream in, cuts join stream-static
    val dir = Files.createTempDirectory("graft_cuts").toString
    scored.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(scored.schema).parquet(dir)
      .join(cuts, Seq("slice"), "left")
      .select(col("doc_id"), L.bucketOf(col("score"), col("__c1"), col("__c2")).as("bucket"))
    val q = stream.writeStream.format("memory").queryName("cut_stream")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cut_stream").as[(Long, String)].collect().toMap
    assert(got == expected)
    assert(got.values.toSet.intersect(Set("head", "middle", "tail")).size == 3)
  }

  test("streaming near-dup screening against the static band index matches the batch path") {
    import graft.dedup.Dedup
    val d = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
    val newB = d.filter(col("doc_id") % 7 === 0)
    val idx = d.filter(col("doc_id") % 7 =!= 0)
    val index = Dedup.bandKeys(
      Dedup.minhashSignatures(idx, col("doc_id"), col("text"), 3, 16), 16, 4)
    // batch truth
    val expected = Dedup.incrementalCandidates(
        Dedup.minhashSignatures(newB, col("doc_id"), col("text"), 3, 16), index, 16, 4)
      .as[(Long, Long)].collect().toSet
    // stream the new batch through in two micro-batches
    val dir = Files.createTempDirectory("graft_npstream").toString
    newB.select("doc_id", "text").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(
      newB.select("doc_id", "text").schema).parquet(dir)
    val got = scala.collection.mutable.Set[(Long, Long)]()
    val q = Streams.nearDupCandidatesStream(stream, col("doc_id"), col("text"), index, 3, 16, 4)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-micro-batch distinct is a plain batch op at the sink
        got ++= batch.distinct().as[(Long, Long)].collect()
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.toSet == expected)
    assert(expected.nonEmpty)
  }

  test("malformed csv rows are quarantined with the raw line, not dropped or fatal") {
    val dir = Files.createTempDirectory("graft_csvq").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/feed.csv"),
      """id,amount,label
        |1,10.5,ok
        |2,NOT_A_NUMBER,bad-amount
        |3,7.25,ok2
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, amount DOUBLE, label STRING")
    // the helper caches internally — corrupt-only queries throw on a raw
    // CSV scan, and the quarantine count is the whole point
    val df = graft.sources.Sources.csvWithQuarantine(spark, s"$dir/feed.csv", schema)
    val clean = df.filter(col("__corrupt").isNull)
    val quarantine = df.filter(col("__corrupt").isNotNull)
    assert(clean.count() == 2)
    assert(clean.select(sum(col("amount"))).head.getDouble(0) == 17.75)
    val bad = quarantine.collect()
    assert(bad.length == 1)
    // the raw line is preserved verbatim for triage
    assert(bad.head.getString(3) == "2,NOT_A_NUMBER,bad-amount")
    df.unpersist()
    ()
  }

  test("compaction collapses append-accumulated small files, preserving rows") {
    val target = Files.createTempDirectory("graft_compact").toString + "/t"
    // three appended micro-batches, several partitions each -> many files
    (0 until 3).foreach { b =>
      val batch = spark.range(b * 100L, b * 100L + 100L).repartition(8)
        .select(col("id").as("origin_id"), (col("id") * 2).as("payload"))
      graft.sources.Sources.appendDeduped(batch, target, "origin_id")
    }
    val before = spark.read.parquet(target)
    val filesBefore = before.inputFiles.length
    val rowsBefore = before.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // one file per appended micro-batch accumulates (AQE coalesces each
    // batch's own write, but cannot merge across appends)
    assert(filesBefore >= 3, s"expected a file per append, got $filesBefore")
    graft.sources.Sources.compactParquet(spark, target, 512)
    val after = spark.read.parquet(target)
    assert(after.inputFiles.length == 1,
      s"${after.inputFiles.length} files after compaction (before: $filesBefore)")
    assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == rowsBefore)
    // no tmp/trash residue
    val fs = new org.apache.hadoop.fs.Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target + ".__compact_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target + ".__compact_trash")))
  }

  test("run-event log is idempotent per (run,event) and reads back typed") {
    val dir = Files.createTempDirectory("graft_runlog").toString
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    graft.sources.Sources.logRunEvent(spark, dir, "engagement", "run-1", "pipeline_run_start", t0)
    graft.sources.Sources.logRunEvent(spark, dir, "engagement", "run-1", "pipeline_run_end",
      t0.plusSeconds(60))
    // a retried logger call for the same (run, event) overwrites — no dup rows
    graft.sources.Sources.logRunEvent(spark, dir, "engagement", "run-1", "pipeline_run_end",
      t0.plusSeconds(90))
    graft.sources.Sources.logRunEvent(spark, dir, "engagement", "run-2", "pipeline_run_start",
      t0.plusSeconds(120))
    val ev = graft.sources.Sources.readRunEvents(spark, dir)
      .orderBy(col("at")).collect()
    assert(ev.length == 3)
    assert(ev.map(_.getString(2)).toSeq ==
      Seq("pipeline_run_start", "pipeline_run_end", "pipeline_run_start"))
    // the retry's timestamp won — and `at` reads back as a real timestamp
    assert(ev(1).getTimestamp(3).toInstant == t0.plusSeconds(90))
    assert(ev.forall(_.getString(0) == "engagement"))
  }

  test("csv and jsonl round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_src").toString
    val df = GraftSession.table(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    graft.sources.Sources.writeCsv(df, s"$dir/csv")
    val back = graft.sources.Sources.csv(spark, s"$dir/csv", df.schema)
    assert(back.orderBy("doc_id").collect().toSeq == df.orderBy("doc_id").collect().toSeq)

    graft.sources.Sources.writeJsonl(df, s"$dir/json")
    val backJ = graft.sources.Sources.jsonl(spark, s"$dir/json", df.schema)
    assert(backJ.orderBy("doc_id").collect().toSeq == df.orderBy("doc_id").collect().toSeq)
  }

  test("dedupAgainst drops already-ingested origin ids") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("origin_id", "v")
    val incoming = Seq((2L, "b2"), (3L, "c")).toDF("origin_id", "v")
    val got = graft.sources.Sources.dedupAgainst(incoming, existing, "origin_id")
      .select("origin_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("streaming dedup drops repeated keys across micro-batches") {
    implicit val sqlCtx2: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = graft.streaming.Streams.dedupStream(
        input.toDS().toDF(), Seq("user_id"), "ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData(Seq(SessionEvent(1L, t0, 1L), SessionEvent(1L, t0, 2L), SessionEvent(2L, t0, 3L)))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(1L, t0, 4L), SessionEvent(3L, t0, 5L)))
      q.processAllAvailable()
      val users = spark.table("dedup_out").select("user_id").as[Long].collect().sorted.toSeq
      assert(users == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming interval join matches the batch range join") {
    implicit val sqlCtx3: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.Streams.{IntervalEv, PointEv}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val points = MemoryStream[PointEv]
    val intervals = MemoryStream[IntervalEv]
    val q = graft.streaming.Streams.intervalJoinStream(
        points.toDS().toDF(), "ts",
        intervals.toDS().toDF(), "start_hour", "end_hour",
        bucketSeconds = 3600L, maxSpan = "3 hours", watermark = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ivj_out").start()
    try {
      intervals.addData(Seq(
        IntervalEv("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
        IntervalEv("b", ts("2024-01-01 11:30:00"), ts("2024-01-01 12:30:00"))))
      points.addData(Seq(
        PointEv(1L, ts("2024-01-01 10:00:00")),    // on "a" start: IN
        PointEv(2L, ts("2024-01-01 11:45:00")),    // inside both
        PointEv(3L, ts("2024-01-01 12:00:00"))))   // on "a" end: only "b"
      q.processAllAvailable()
      // points can arrive AFTER their interval as long as the watermark
      // hasn't passed — cross-micro-batch matching is the point of state
      points.addData(Seq(PointEv(4L, ts("2024-01-01 12:15:00"))))
      q.processAllAvailable()
      val got = spark.table("ivj_out").select("pid", "iid")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (4L, "b")))
    } finally q.stop()
    // an interval longer than maxSpan would silently lose tail matches to
    // the eviction bound — it must fail the query instead
    val points2 = MemoryStream[PointEv]
    val intervals2 = MemoryStream[IntervalEv]
    val q2 = graft.streaming.Streams.intervalJoinStream(
        points2.toDS().toDF(), "ts",
        intervals2.toDS().toDF(), "start_hour", "end_hour",
        bucketSeconds = 3600L, maxSpan = "3 hours", watermark = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ivj_bad").start()
    try {
      intervals2.addData(Seq(
        IntervalEv("too_long", ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00"))))
      points2.addData(Seq(PointEv(9L, ts("2024-01-01 10:30:00"))))
      val ex = intercept[Exception] { q2.processAllAvailable() }
      // walk the whole cause chain: streaming wraps the raise_error several
      // levels deep and how far varies by Spark version
      val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(chain.contains("longer than maxSpan"), chain)
    } finally q2.stop()
  }

  test("stateful sessionization runs on the RocksDB state store (the scale backend)") {
    // the provider is a runtime conf read at query start; exercise the
    // disk-backed path end-to-end and confirm state actually lives in it
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[SessionEvent]
      val q = graft.streaming.Streams.sessionize(input.toDS(), 1800L)
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("rocksdb_sessions").start()
      try {
        val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
        input.addData(Seq(SessionEvent(1L, t(0), 1L), SessionEvent(1L, t(10), 2L)))
        q.processAllAvailable()
        input.addData(Seq(SessionEvent(1L, t(20), 3L), SessionEvent(2L, t(21), 4L)))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.nonEmpty)
        assert(spark.table("rocksdb_sessions").count() > 0)
        assert(q.lastProgress.stateOperators.head.numRowsTotal >= 2)
        // provider-specific custom metrics prove RocksDB actually served
        // the state (a misspelled conf silently falls back to the heap
        // provider, whose metrics carry no rocksdb entries)
        val metricKeys = q.lastProgress.stateOperators.head.customMetrics.keySet()
        assert(metricKeys.toString.toLowerCase.contains("rocksdb"), metricKeys.toString)
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming curation matches the batch filter+redact on the same docs") {
    val batch = GraftSession.table(spark, sfDir, "documents")
      .withColumn("text", concat(col("text"), lit(" mail x"), col("doc_id").cast("string"),
        lit("@ex.ample")))
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft_curate_stream").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = graft.streaming.Streams.curateStream(stream, "text")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curate_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curate_out").orderBy("doc_id").collect().toSeq
      val expected = graft.streaming.Streams.curateStream(batch, "text")
        .orderBy("doc_id").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
      // stateless plan: nothing in the state store
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streaming anomaly scorer matches the batch z-score sweep on the same rows") {
    val batch = GraftSession.table(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
    val moments = graft.analysis.Stats.groupMoments(batch,
      col("event_type"), col("value"))
    val dir = Files.createTempDirectory("graft_anomaly_stream").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = graft.streaming.Streams.anomalyScoreStream(stream, col("event_type"),
        col("event_id"), col("value"), moments, 2.0)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("anomaly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("anomaly_out").orderBy("group_key", "row_id")
        .collect().toSeq
      val expected = graft.analysis.Stats.zscoreOutliers(batch, col("event_type"),
        col("event_id"), col("value"), 2.0).orderBy("group_key", "row_id")
        .collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
      // stateless plan: broadcast stream-static join, nothing in the state store
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streaming PQ encode is stateless and matches the batch encode on the same vectors") {
    val corpus = GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"),
        graft.similarity.Knn.toDoubleArray(col("embedding")).as("vec"))
    val codebookDf = graft.similarity.Pq.train(corpus, m = 8, dim = 64, ksub = 8, iters = 1)
    val cb = graft.similarity.Pq.collectCodebook(codebookDf)

    val dir = Files.createTempDirectory("graft_pq_stream").toString
    corpus.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema).parquet(dir)
    val q = graft.streaming.Streams.pqEncodeStream(stream, cb)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pq_encode_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pq_encode_out").orderBy("id").collect().toSeq
      val expected = graft.similarity.Pq.encode(corpus, codebookDf, m = 8, dim = 64)
        .orderBy("id").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
      // stateless plan: nothing in the state store
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streaming engagement flow is stateless and matches the batch export; foreachBatch state merges to the batch funnel") {
    val ev = GraftSession.table(spark, sfDir, "events")
    val kCol = nullif(regexp_extract(col("props"), "[0-9]+", 0), lit("")).cast("int")
    val testDeny = ev.filter(col("event_type") === "error" && col("value") > 320.0)
      .select(col("user_id"))
    val withdrawn = ev.filter(col("event_type") === "error" && col("value") > 250.0)
      .select(col("user_id"))
    def run(df: org.apache.spark.sql.DataFrame) = graft.streaming.Streams.engagementStream(
      df, "user_id", col("event_type"), col("ts"),
      "2024-01-08 00:00:00", "2024-01-21 00:00:00", testDeny, withdrawn,
      c => c.cast("int") >= 50, "ws_", kCol, col("event_id"), col("value"), "TRUE_MISSING")
    val dir = Files.createTempDirectory("graft_eng_stream").toString
    val stateDir = Files.createTempDirectory("graft_eng_state").toString
    ev.write.mode("overwrite").parquet(dir)
    // maxFilesPerTrigger forces multiple micro-batches over the parquet dir
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = run(stream).writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("eng_stream_out").start()
    val qs = stream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.streaming.Streams.appendFunnelState(batch, batchId, stateDir, "user_id",
          col("event_type"), col("ts"), "2024-01-08 00:00:00", "2024-01-21 00:00:00",
          testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol)
      }.start()
    try {
      q.processAllAvailable(); qs.processAllAvailable()
      val streamed = spark.table("eng_stream_out").orderBy("message_id").collect().toSeq
      val expected = run(ev).orderBy("message_id").collect().toSeq
      assert(streamed.nonEmpty && streamed == expected)
      assert(q.lastProgress.stateOperators.isEmpty) // stateless plan
      // merged per-micro-batch state == the batch funnel
      val merged = graft.analysis.EngagementPipeline.funnelEstimate(
        graft.analysis.EngagementPipeline.mergeFunnelStates(
          spark.read.parquet(stateDir)))
        .collect().map(r => (r.getInt(0), r.getString(2)) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val batchFunnel = graft.analysis.EngagementPipeline.funnel(ev, "user_id",
        col("event_type"), col("ts"), "2024-01-08 00:00:00", "2024-01-21 00:00:00",
        testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol)
        .collect().map(r => (r.getInt(0), r.getString(2)) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(merged.keySet == batchFunnel.keySet)
      // counts and imputed add exactly; distinct participants are HLL
      // estimates — exact at this cardinality for most cells, so compare
      // with a 2% tolerance
      merged.foreach { case (k, (n, p, imp)) =>
        val (bn, bp, bimp) = batchFunnel(k)
        assert(n == bn && imp == bimp, s"counts for $k")
        assert(math.abs(p - bp) <= math.max(1L, (bp * 0.02).toLong), s"participants for $k")
      }
      // replay safety: a redelivered epoch OVERWRITES its batch_id subdir,
      // so writing the same batch twice leaves merged counts unchanged
      val replayDir = Files.createTempDirectory("graft_eng_state_replay").toString
      def deliver(): Unit = graft.streaming.Streams.appendFunnelState(
        ev, 7L, replayDir, "user_id",
        col("event_type"), col("ts"), "2024-01-08 00:00:00", "2024-01-21 00:00:00",
        testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol)
      def counts() = graft.analysis.EngagementPipeline.funnelEstimate(
        graft.analysis.EngagementPipeline.mergeFunnelStates(
          spark.read.parquet(replayDir)))
        .collect().map(r => (r.getInt(0), r.getString(2)) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      deliver()
      val onceDelivered = counts()
      deliver()
      assert(counts() == onceDelivered, "replayed epoch must not double-count")
    } finally { q.stop(); qs.stop() }
  }

  test("typed Message model adapts events") {
    val ev = GraftSession.table(spark, sfDir, "events")
    val msgs = graft.model.Model.eventsAsMessages(spark, ev)
    assert(msgs.count() == ev.count())
    val m = msgs.filter(_.dataset == "purchase").head()
    assert(m.participant_uuid.nonEmpty && m.message_id >= 0)
  }

  test("streaming near-dup dedup via fingerprint column") {
    val docs = GraftSession.table(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
      .withColumn("fp", graft.functions.ShingleExpressions.bottomKFingerprint(col("text"), 3, 4))
      .withColumn("ingest_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val q = graft.streaming.Streams.dedupStream(stream, Seq("fp"), "ingest_ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("fp_dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fp_dedup_out").count()
      val batch = docs
        .withColumn("fp", graft.functions.ShingleExpressions.bottomKFingerprint(col("text"), 3, 4))
        .dropDuplicates("fp").count()
      assert(streamed == batch)
      assert(streamed < docs.count()) // the planted near-dups collapse
    } finally q.stop()
  }

  test("uuid table round-trips pseudonymization") {
    val ev = GraftSession.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id").cast("string").as("urn"), col("value"))
    val table = graft.sources.UuidTable.build(ev, "urn")
    // stable: rebuilding yields the same mapping
    assert(table.collect().toSet == graft.sources.UuidTable.build(ev, "urn").collect().toSet)
    val pseud = graft.sources.UuidTable.pseudonymize(ev, "urn", table)
    assert(pseud.columns.contains("participant_uuid") && !pseud.columns.contains("urn"))
    assert(pseud.count() == ev.count())
    val back = graft.sources.UuidTable.reidentify(pseud, table)
    assert(back.select("event_id", "urn", "value").orderBy("event_id").collect().toSeq ==
      ev.select("event_id", "urn", "value").orderBy("event_id").collect().toSeq)
  }

  test("json ingest flattens nested submissions into per-answer messages") {
    val payloads = Seq(
      """{"response_id":"r1","participant":"p1","submitted_at":"2024-01-01T10:00:00Z","answers":[{"question_id":"q_age","text":"25"},{"question_id":"q_loc","text":"nairobi"}]}""",
      """{"response_id":"r2","participant":"p2","submitted_at":"2024-01-02T11:00:00Z","answers":[{"question_id":"q_age","text":"30"}]}"""
    ).toDF("payload")
    val got = graft.sources.JsonIngest.flattenSubmissions(payloads)
    assert(got.count() == 3)
    val r1 = got.filter(col("origin_id") === "r1/0").head()
    assert(r1.getAs[String]("dataset") == "q_age" && r1.getAs[String]("text") == "25")
    assert(got.select("origin_id").distinct().count() == 3)
  }

  test("mergeSync keeps the newest version per key, remote wins ties") {
    val local = Seq(("m1", 2L, "local-new"), ("m2", 1L, "local-only")).toDF("id", "v", "body")
    val remote = Seq(("m1", 1L, "remote-old"), ("m2", 1L, "remote-tie"), ("m3", 5L, "remote-only"))
      .toDF("id", "v", "body")
    val got = graft.sources.JsonIngest.mergeSync(local, remote, "id", "v")
      .select("id", "body").as[(String, String)].collect().toMap
    assert(got == Map("m1" -> "local-new", "m2" -> "remote-tie", "m3" -> "remote-only"))
  }

  test("streaming sliding window agg equals the batch twin") {
    val batch = GraftSession.table(spark, sfDir, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_slide").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = graft.streaming.Streams.slidingCounts(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("sliding_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_out").orderBy("win_start", "event_type").collect().toSeq
      val expected = SparkEntry.queries("sliding_window_agg")(spark, sfDir)
        .orderBy("win_start", "event_type").collect().toSeq
      assert(streamed == expected)
    } finally q.stop()
  }

  test("foreachBatch training ingest dedups across micro-batches via the persisted archive index") {
    val C = graft.curation.Curation
    // every trigram window contains the per-doc token, so docs share no
    // trigrams (same construction as the scale probe); stopword mass and
    // length make the quality stage pass, 'en' makes langid agree
    def body(i: Long) =
      s"w${i}a the of w${i}b and to w${i}c in is w${i}d a of w${i}e"
    val w = Map("en" -> 100)
    val bench = Seq((999L, body(999), "en")).toDF("doc_id", "text", "lang")
    val batchA = Seq(1L, 2L, 3L, 4L, 5L).map(i => (i, body(i), "en"))
    // doc 11 re-ingests doc 1's exact text — it must die at exact_dedup
    // in the SECOND batch, via the archive index, not in-batch state
    val batchB = Seq((11L, body(1), "en")) ++
      Seq(12L, 13L, 14L, 15L).map(i => (i, body(i), "en"))

    val archDir = Files.createTempDirectory("graft_arch").toString
    val outDir = Files.createTempDirectory("graft_ingested").toString
    Seq.empty[String].toDF("digest").write.mode("overwrite").parquet(archDir)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF.toDF("doc_id", "text", "lang").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val arch = spark.read.parquet(archDir)
        C.trainingIngestSurvivors(b, arch, bench,
          col("doc_id"), col("text"), col("lang"), col("lang"), w)
          .write.mode("append").parquet(outDir)
        // the ingest contract: every batch text joins the index, kept or not
        b.select(md5(col("text")).as("digest")).write.mode("append").parquet(archDir)
        ()
      }.start()
    try {
      input.addData(batchA); q.processAllAvailable()
      input.addData(batchB); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L, 12L, 13L, 14L, 15L),
      s"doc 11 must die against the archive index: $got")
    // the streamed end-state equals the two-step batch formulation
    val a = batchA.toDF("doc_id", "text", "lang")
    val b2 = batchB.toDF("doc_id", "text", "lang")
    val step1 = C.trainingIngestSurvivors(a,
      Seq.empty[String].toDF("digest"), bench,
      col("doc_id"), col("text"), col("lang"), col("lang"), w)
    val step2 = C.trainingIngestSurvivors(b2,
      a.select(md5(col("text")).as("digest")), bench,
      col("doc_id"), col("text"), col("lang"), col("lang"), w)
    val expected = step1.unionAll(step2)
    val streamed = spark.read.parquet(outDir)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
    // and the incremental funnel agrees: batch B loses exactly one doc at dedup
    val funnelB = C.trainingIngest(b2, a.select(md5(col("text")).as("digest")),
      bench, col("doc_id"), col("text"), col("lang"), col("lang"), w)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(funnelB(2) == 5 && funnelB(3) == 4,
      s"batch B: 5 pass quality, 4 survive archive dedup: $funnelB")
  }
}
