package graft

import org.apache.spark.sql.functions._

import graft.operators.{Provenance, WsCorrection}

/** WS-correction cycle defense, provenance history, watermark cache. */
class SyncOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("one WS-correction step matches the reference decision table") {
    val msgs = Seq(
      // (id, dataset, previous, proposed)
      (1L, "age", Seq.empty[String], null.asInstanceOf[String]), // no ws code
      (2L, "age", Seq.empty[String], "age"),                     // corrected to current
      (3L, "age", Seq.empty[String], "gender"),                  // normal move
      (4L, "gender", Seq("age"), "age"),                         // revisit -> cycle fix
      (5L, "county", Seq("age", "gender"), "gender")             // revisit deeper in history
    ).toDF("id", "dataset", "previous", "proposed")
    val out = WsCorrection.correctStep(msgs, col("dataset"), col("previous"), col("proposed"))
      .select(col("id"), col("sync_event"), col("new_dataset"), col("new_previous"), col("labels_cleared"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getSeq[String](3), r.getBoolean(4)))).toMap
    assert(out(1L) == (("labels_match", "age", Seq(), false)))
    assert(out(2L) == (("ws_correct_to_current", "age", Seq(), false)))
    assert(out(3L) == (("ws_correction", "gender", Seq("age"), true)))
    // cycle fix resets to the ORIGINAL dataset (previous[0]) and clears history
    assert(out(4L) == (("fix_ws_cycle", "age", Seq(), true)))
    assert(out(5L) == (("fix_ws_cycle", "age", Seq(), true)))
  }

  test("correction chase follows chains and breaks cycles at fixpoint") {
    // map: a -> b -> c (terminal), x -> y -> x (2-cycle)
    val corrections = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")).toDF("from_ds", "to_ds")
    val msgs = Seq(
      (1L, "a", Seq.empty[String]),
      (2L, "x", Seq.empty[String]),
      (3L, "c", Seq.empty[String])
    ).toDF("id", "dataset", "previous")
    val out = WsCorrection.correctToFixpoint(msgs, "dataset", "previous", corrections)
      .select(col("id"), col("dataset"), col("ws_frozen"), col("last_event"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getString(3)))).toMap
    // a -> b -> c, terminal: two moves, settled
    assert(out(1L)._1 == "c" && !out(1L)._2)
    // x -> y, then y -> x revisits the history: cycle fixed back to the
    // original dataset and frozen (awaits human recode, as in the reference)
    assert(out(2L) == (("x", true, "fix_ws_cycle")))
    // already terminal: never moved
    assert(out(3L)._1 == "c" && out(3L)._3 == "labels_match")
  }

  test("lazy correction chase (countMoves=false) matches the probed path") {
    val corrections = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")).toDF("from_ds", "to_ds")
    val msgs = Seq(
      (1L, "a", Seq.empty[String]),
      (2L, "x", Seq.empty[String]),
      (3L, "c", Seq.empty[String])
    ).toDF("id", "dataset", "previous")
    def run(probe: Boolean) = WsCorrection
      .correctToFixpoint(msgs, "dataset", "previous", corrections, countMoves = probe)
      .select(col("id"), col("dataset"), col("ws_frozen"), col("last_event"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(run(false) == run(true))
  }

  test("provenance history accumulates across chained transforms") {
    val at = lit(ts("2024-01-01 00:00:00"))
    val base = Seq((1L, "u1", ts("2024-01-02 00:00:00")), (2L, "u1", ts("2024-01-03 00:00:00")))
      .toDF("id", "user", "ts")
    val snapped = Provenance.withProvenance(
      graft.operators.Snapshots.latest(
        Provenance.withProvenance(base, "ingest", at), Seq(col("user")), col("ts"), col("id")),
      "snapshot_latest", at)
    val relabeled = Provenance.withProvenance(
      snapped.withColumn("user", concat(lit("ws_"), col("user"))), "relabel", at)
    val rows = relabeled.select(Provenance.historySteps(relabeled).as("steps")).collect()
    assert(rows.length == 1) // snapshot kept only the latest row
    assert(rows.head.getSeq[String](0) == Seq("ingest", "snapshot_latest", "relabel"))
    // export projection drops the lineage column
    assert(!Provenance.withoutProvenance(relabeled).columns.contains(Provenance.HistoryCol))
  }

  test("null-timestamp rows ride along in every incremental slice instead of vanishing") {
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft_wm_null").toString
    val df = Seq((1L, Some(ts("2024-01-01 10:00:00"))), (2L, Option.empty[java.sql.Timestamp]))
      .toDF("id", "ts")
    var seen: Seq[Long] = Nil
    // first run: full table including the null-ts row
    Sources.syncIncremental(spark, df, col("ts"), dir, "events") { s =>
      seen = s.select("id").as[Long].collect().toSeq.sorted
    }
    assert(seen == Seq(1L, 2L), "null-ts row must be delivered on first run")
    // second run: nothing new is orderable, but the null-ts row cannot be
    // proven already-synced by any watermark — it is redelivered
    // (at-least-once; dedupAgainst makes storage effectively-once)
    Sources.syncIncremental(spark, df, col("ts"), dir, "events") { s =>
      seen = s.select("id").as[Long].collect().toSeq.sorted
    }
    assert(seen == Seq(2L), "null-ts row must not silently vanish after the first run")
    assert(Sources.readWatermark(spark, dir, "events") == Some(ts("2024-01-01 10:00:00")))
  }

  test("watermark cache round-trips and drives incremental sync") {
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    val df = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 10:00:00")))
      .toDF("id", "ts")
    assert(Sources.readWatermark(spark, dir, "events") == None)
    // first sync: no watermark -> full table; cache advances AFTER process
    var seen: Seq[Long] = Nil
    Sources.syncIncremental(spark, df, col("ts"), dir, "events") { s =>
      seen = s.select("id").as[Long].collect().toSeq.sorted
    }
    assert(seen == Seq(1L, 2L))
    assert(Sources.readWatermark(spark, dir, "events") == Some(ts("2024-01-02 10:00:00")))
    // second sync over the same data: nothing new, watermark unchanged
    Sources.syncIncremental(spark, df, col("ts"), dir, "events") { s =>
      seen = s.select("id").as[Long].collect().toSeq
    }
    assert(seen == Nil)
    assert(Sources.readWatermark(spark, dir, "events") == Some(ts("2024-01-02 10:00:00")))
    // new rows arrive: only they are read, watermark advances
    val grown = df.union(Seq((3L, ts("2024-01-03 10:00:00"))).toDF("id", "ts"))
    Sources.syncIncremental(spark, grown, col("ts"), dir, "events") { s =>
      seen = s.select("id").as[Long].collect().toSeq
    }
    assert(seen == Seq(3L))
    assert(Sources.readWatermark(spark, dir, "events") == Some(ts("2024-01-03 10:00:00")))
    // a FAILED process must leave the watermark untouched so the slice is
    // re-read next round (at-least-once)
    val grown2 = grown.union(Seq((4L, ts("2024-01-04 10:00:00"))).toDF("id", "ts"))
    intercept[RuntimeException] {
      Sources.syncIncremental(spark, grown2, col("ts"), dir, "events") { _ =>
        throw new RuntimeException("downstream write failed")
      }
    }
    assert(Sources.readWatermark(spark, dir, "events") == Some(ts("2024-01-03 10:00:00")))
    Sources.syncIncremental(spark, grown2, col("ts"), dir, "events") { s =>
      seen = s.select("id").as[Long].collect().toSeq
    }
    assert(seen == Seq(4L))
  }

  test("native as-of rejects mismatched key types at plan time") {
    val left = Seq((1L, 1, ts("2024-01-01 10:00:00"), 1.0)).toDF("event_id", "user", "ts", "value")
    val right = Seq((2L, 1L, ts("2024-01-01 09:00:00"), 2.0)).toDF("event_id", "user", "ts", "value")
    val e = intercept[Exception] {
      graft.plans.AsOfJoinNative.asOf(left, right, "user", "ts", "ts", "event_id", Seq("value")).collect()
    }
    assert(e.getMessage.contains("key types must match"), e.getMessage)
  }

  test("sized parquet writer picks file count from plan statistics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").toString
    val df = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
    // tiny target forces multiple files; the count must follow the estimate
    graft.sources.Sources.writeSizedParquet(df, s"$dir/out", targetMb = 1)
    val files = new java.io.File(s"$dir/out").listFiles().count(_.getName.endsWith(".parquet"))
    val estMb = (df.queryExecution.optimizedPlan.stats.sizeInBytes / (1L << 20)).toLong
    assert(files >= 2, s"expected multiple ~1MB files for ~${estMb}MB estimate, got $files")
    // round-trips losslessly
    assert(spark.read.parquet(s"$dir/out").count() == df.count())
  }

  test("approx dashboard variants track the exact oracle-gated forms") {
    // the 100-TB paths for the two exact-form scale risks: HLL distinct
    // counts and sketched quantiles must stay within their error bounds
    val ev = GraftSession.table(spark, "/root/testdata/sf0.01", "events")
    val exactStats = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approxStats = graft.analysis.Engagement.statsApprox(ev, col("event_type"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    exactStats.foreach { case (k, exact) =>
      val approx = approxStats(k)
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"$k: approx $approx vs exact $exact")
    }
    val exactQ = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.5D, 0.9D))").as("q")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approxQ = graft.analysis.Engagement.quantilesApprox(
        ev, col("event_type"), col("value"), Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
    exactQ.foreach { case (k, ex) =>
      approxQ(k).zip(ex).foreach { case (a, e) =>
        assert(math.abs(a - e) / math.max(math.abs(e), 1e-9) < 0.05,
          s"$k: approx $a vs exact $e")
      }
    }
  }

  test("simhash64 pairs keep pigeonhole recall and cut false candidates vs 32-bit") {
    // simhash hamming scales as width*sqrt(2/(pi*n_tokens)) per differing
    // token, so hamming<=3 near-dups need docs sharing hundreds of tokens:
    // 600 common tokens + 1 unique per doc; doc 1 = doc 0 plus one extra
    // token (the engineered true near-dup)
    val common = (0 until 600).map(j => s"tok$j").mkString(" ")
    val docs = (0 until 200).map { i =>
      val text = if (i == 1) s"$common uniq0 uniqx" else s"$common uniq$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val p64 = graft.dedup.Dedup.simhashPairs64(docs, col("doc_id"), col("text"), 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p32 = graft.dedup.Dedup.simhashPairs(docs, col("doc_id"), col("text"), 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the engineered near-dup must be found at both widths
    assert(p64.contains((0L, 1L)), s"64-bit missed the true pair: $p64")
    assert(p32.contains((0L, 1L)))
    // wider hash discriminates at least as well (no extra false pairs)
    assert(p64.size <= p32.size)
  }
}
