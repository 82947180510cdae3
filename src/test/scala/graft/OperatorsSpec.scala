package graft

import org.apache.spark.sql.functions._

import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Snapshots.latest keeps the newest version per key with tiebreak") {
    val df = Seq(
      ("m1", 1L, "old"), ("m1", 3L, "new"), ("m1", 2L, "mid"),
      ("m2", 5L, "only")
    ).toDF("id", "v", "payload")
    val got = Snapshots.latest(df, Seq(col("id")), col("v"), col("payload"))
      .select("id", "payload").as[(String, String)].collect().toMap
    assert(got == Map("m1" -> "new", "m2" -> "only"))
  }

  test("Snapshots.latest breaks version ties deterministically") {
    val df = Seq(("m1", 1L, "a"), ("m1", 1L, "b")).toDF("id", "v", "payload")
    val got = Snapshots.latest(df, Seq(col("id")), col("v"), col("payload"))
      .select("payload").as[String].collect().toSeq
    assert(got == Seq("b")) // desc tiebreak on payload
  }

  test("Snapshots.cdcApply: upsert overrides, tombstone deletes, later upsert resurrects") {
    val base = Seq(
      ("u1", 1L, "a"), ("u2", 1L, "b"), ("u3", 1L, "c"))
      .toDF("id", "v", "payload").withColumn("op", lit("U"))
    val changes = Seq(
      ("u1", 2L, "a2", "U"),              // plain update
      ("u2", 2L, "x", "D"),               // tombstone: u2 gone
      ("u3", 2L, "x", "D"), ("u3", 3L, "c3", "U"), // delete then resurrect
      ("u4", 2L, "d", "U"))               // insert (not in base)
      .toDF("id", "v", "payload", "op")
    def apply2(c: org.apache.spark.sql.DataFrame) =
      Snapshots.cdcApply(base, c, col("op") === "D",
        Seq(col("id")), col("v"), col("payload"))
    val got = apply2(changes).select("id", "payload")
      .as[(String, String)].collect().toMap
    assert(got == Map("u1" -> "a2", "u3" -> "c3", "u4" -> "d"))
    // replay-the-log: applying in two batch splits = one-shot apply
    val twoStep = Snapshots.cdcApply(
      apply2(changes.filter(col("v") <= 2)).drop("op")
        .withColumn("op", lit("U")),
      changes.filter(col("v") > 2), col("op") === "D",
      Seq(col("id")), col("v"), col("payload"))
      .select("id", "payload").as[(String, String)].collect().toMap
    assert(twoStep == got)
  }

  test("Filters.activeRecords keeps live plus stale-without-live") {
    val df = Seq(
      (1, "live", "u1"), (2, "stale", "u1"), // u1 has live -> stale dropped
      (3, "stale", "u2"),                    // u2 stale only -> kept
      (4, "archived", "u3")                  // neither live nor stale -> dropped
    ).toDF("id", "status", "user")
    val got = Filters.activeRecords(df, "user", col("status") === "live", col("status") === "stale")
      .select("id").as[Int].collect().toSet
    assert(got == Set(1, 3))
  }

  test("Imputation.band maps thresholds correctly") {
    val df = Seq(-5.0, 0.0, 999.0, 1000.0, 7000.0).toDF("x")
    val got = df.select(Imputation.band(col("x"), Seq(0.0, 1000.0, 5000.0),
      Seq("negative", "low", "mid", "high")).as("b")).as[String].collect().toSeq
    assert(got == Seq("negative", "low", "low", "mid", "high"))
  }

  test("Imputation.propagateFlag marks every row of a flagged entity") {
    val df = Seq(("u1", "stop"), ("u1", "hello"), ("u2", "hi")).toDF("user", "text")
    val got = Imputation.propagateFlag(df, "user", col("text") === "stop", "withdrawn")
      .select("user", "withdrawn").as[(String, Boolean)].collect().toSet
    assert(got == Set(("u1", true), ("u2", false)))
  }

  test("Imputation.imputeMissing substitutes for null and empty") {
    val df = Seq(Some("x"), Some(""), None).toDF("v")
    val got = df.select(Imputation.imputeMissing(col("v"), "NA").as("c")).as[String].collect().toSeq
    assert(got == Seq("x", "NA", "NA"))
  }

  test("Sessionize splits on gap and counts sessions") {
    val base = 1700000000000000L // µs
    val df = Seq(
      ("u1", base, 1L), ("u1", base + 60L * 1000000, 2L),            // same session
      ("u1", base + 4000L * 1000000, 3L),                            // gap > 1800s -> new
      ("u2", base, 4L),
      // gap of EXACTLY 1800s continues the session (split is strictly >)
      ("u3", base, 5L), ("u3", base + 1800L * 1000000, 6L),
      ("u3", base + 3601L * 1000000, 8L)                             // 1801s gap -> new
    ).map { case (u, t, id) => (u, new java.sql.Timestamp(t / 1000), id) }
      .toDF("user", "ts", "id")
    val got = Sessionize.sessionCounts(df, "user", col("ts"), col("id"), 1800L)
      .select("user", "n_sessions").as[(String, Long)].collect().toMap
    assert(got == Map("u1" -> 2L, "u2" -> 1L, "u3" -> 2L))
  }

  test("RangeJoin.pointInInterval matches the naive inequality join, closed-open") {
    val points = Seq(
      (1L, "2024-01-01 00:00:00"),     // exactly on interval start: IN
      (2L, "2024-01-01 02:59:59.9"),   // sub-second, just inside: IN
      (3L, "2024-01-01 03:00:00"),     // exactly on interval end: OUT
      (4L, "2024-01-01 01:30:00"),     // mid-interval: IN
      (5L, "2024-01-02 12:00:00"))     // far outside: OUT
      .toDF("pid", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val intervals = Seq(
      ("a", "2024-01-01 00:00:00", "2024-01-01 03:00:00"),  // spans many cells
      ("b", "2024-01-01 01:00:00", "2024-01-01 01:45:00"))  // overlapping, sub-cell
      .toDF("iid", "s", "e")
      .withColumn("s", col("s").cast("timestamp")).withColumn("e", col("e").cast("timestamp"))
    // tiny 600 s grid so interval "a" explodes across 19 cells
    val got = RangeJoin.pointInInterval(points, col("ts"), intervals, col("s"), col("e"), 600L)
      .select("pid", "iid").as[(Long, String)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").as[(Long, String)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, "a"), (2L, "a"), (4L, "a"), (4L, "b")))
  }

  test("RangeJoin raises on malformed or over-long intervals instead of silent junk") {
    val points = Seq((1L, "2024-01-01 00:30:00")).toDF("pid", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    // end before start: sequence would silently emit descending cells
    val swapped = Seq(("a", "2024-01-01 03:00:00", "2024-01-01 00:00:00"))
      .toDF("iid", "s", "e")
      .withColumn("s", col("s").cast("timestamp")).withColumn("e", col("e").cast("timestamp"))
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, col("ts"), swapped, col("s"), col("e"), 600L).collect()
    }
    assert(ex.getMessage.contains("malformed or over-long"), ex.getMessage)
    // one corrupt far-future end would explode millions of cells
    val corrupt = Seq(("b", "2024-01-01 00:00:00", "9999-12-31 00:00:00"))
      .toDF("iid", "s", "e")
      .withColumn("s", col("s").cast("timestamp")).withColumn("e", col("e").cast("timestamp"))
    val ex2 = intercept[Exception] {
      RangeJoin.pointInInterval(points, col("ts"), corrupt, col("s"), col("e"), 600L).collect()
    }
    assert(ex2.getMessage.contains("malformed or over-long"), ex2.getMessage)
    // NULL bounds are SQL semantics, not corruption: the row silently
    // matches nothing (as in the naive inequality join) — no crash
    val nullEnd = Seq(("c", "2024-01-01 00:00:00", null: String)).toDF("iid", "s", "e")
      .withColumn("s", col("s").cast("timestamp")).withColumn("e", col("e").cast("timestamp"))
    val rows = RangeJoin.pointInInterval(points, col("ts"), nullEnd, col("s"), col("e"), 600L)
      .collect()
    assert(rows.isEmpty)
  }

  test("RangeJoin.hotIntervals merges consecutive hot hours into maximal intervals") {
    // 3 events in hours h0,h1 and in h3; 1 event elsewhere → avg < 3, so
    // hot = {h0,h1,h3}: one merged [h0,h2) island and one [h3,h4)
    def at(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = (Seq(0, 1, 3).flatMap(h => Seq(at(h, 1), at(h, 2), at(h, 3))) ++
      Seq(at(5, 0))).map(Tuple1(_)).toDF("ts")
    val got = RangeJoin.hotIntervals(ev, col("ts"))
      .select("start_hour", "end_hour").as[(java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSet
    assert(got == Set((at(0, 0), at(2, 0)), (at(3, 0), at(4, 0))))
  }

  test("ColumnView.foldConcat concatenates in order regardless of input order") {
    val df = Seq(("u1", 3L, "c"), ("u1", 1L, "a"), ("u1", 2L, "b")).toDF("user", "o", "t")
    val got = ColumnView.foldConcat(df, "user", col("o"), col("o"), col("t"), ";")
      .select("folded_text").as[String].collect().head
    assert(got == "a;b;c")
  }

  test("ColumnView.attributeSet emits a sorted distinct set") {
    val df = Seq(("u1", "z"), ("u1", "a"), ("u1", "z")).toDF("user", "op")
    val got = ColumnView.attributeSet(df, "user", col("op"), ";")
      .select("operators").as[String].collect().head
    assert(got == "a;z")
  }
}
