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
      ("u2", base, 4L)
    ).map { case (u, t, id) => (u, new java.sql.Timestamp(t / 1000), id) }
      .toDF("user", "ts", "id")
    val got = Sessionize.sessionCounts(df, "user", col("ts"), col("id"), 1800L)
      .select("user", "n_sessions").as[(String, Long)].collect().toMap
    assert(got == Map("u1" -> 2L, "u2" -> 1L))
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
