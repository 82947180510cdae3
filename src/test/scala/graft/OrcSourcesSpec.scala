package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the ORC ingest/export path: round-trip identity against the
  * parquet-born events table, timestamp/decimal fidelity, and — the
  * reason ORC is first-class — predicate pushdown and column pruning
  * reaching the ORC scan exactly like parquet.
  */
class OrcSourcesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ORC round-trips the events table byte-identically") {
    val events = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_orc").toString
    graft.sources.Sources.writeOrc(events, dir)
    val back = graft.sources.Sources.orc(spark, dir)
    assert(back.schema === events.schema)
    val a = events.orderBy("event_id").collect().toSeq
    val b = back.orderBy("event_id").collect().toSeq
    assert(a === b)
  }

  test("eraseKeys physically removes denied keys, leaves the rest intact") {
    import spark.implicits._
    val events = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_erase").toString + "/events"
    events.write.parquet(dir)
    val deny = Seq(1L, 2L, 3L).toDF("user_id")
    val expected = events.filter(!col("user_id").isin(1L, 2L, 3L))
      .orderBy("event_id").collect().toSeq
    val (before, after) = graft.sources.Sources.eraseKeys(spark, dir, "user_id", deny)
    assert(before === events.count())
    assert(after === expected.length.toLong && after < before)
    val back = spark.read.parquet(dir)
    assert(back.orderBy("event_id").collect().toSeq === expected)
    assert(back.filter(col("user_id").isin(1L, 2L, 3L)).count() === 0)
    // no leftover temp/trash dirs
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("__erase")))
    // idempotent: a second sweep with the same deny list is a no-op
    val (b2, a2) = graft.sources.Sources.eraseKeys(spark, dir, "user_id", deny)
    assert(b2 === after && a2 === after)
  }

  test("schemaDiff: add/remove/type/nullability classified, order ignored") {
    import org.apache.spark.sql.types._
    val old = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType, nullable = false), StructField("gone", IntegerType)))
    val neu = StructType(Seq(
      StructField("b", StringType), StructField("a", LongType), // reordered: NOT drift
      StructField("c", DoubleType, nullable = true),            // loosened
      StructField("d", TimestampType)))                         // new
    val diff = graft.sources.Sources.schemaDiff(old, neu)
    assert(diff.toSet === Set(
      ("added", "d", "timestamp"),
      ("removed", "gone", "int"),
      ("nullability_changed", "c", "false -> true")))
    assert(graft.sources.Sources.schemaDiff(old, old).isEmpty)
    // type change reports both sides
    val t = StructType(Seq(StructField("a", StringType)))
    assert(graft.sources.Sources.schemaDiff(
      StructType(Seq(StructField("a", LongType))), t) ===
      Seq(("type_changed", "a", "bigint -> string")))
  }

  test("filters and column pruning reach the ORC scan") {
    val events = GraftSession.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_orc_push").toString
    graft.sources.Sources.writeOrc(events, dir)
    val q = graft.sources.Sources.orc(spark, dir)
      .filter(col("value") > 100.0 && col("event_type") === "purchase")
      .select("event_id", "value")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(value), IsNotNull(event_type), " +
      "GreaterThan(value,100.0), EqualTo(event_type,purchase)"), p)
    assert(p.contains("ReadSchema: struct<event_id:bigint,event_type:string,value:double>"), p)
    assert(!p.contains("user_id"), "pruned column must not be read")
    // and the result matches the parquet-side computation
    val expected = events.filter(col("value") > 100.0 && col("event_type") === "purchase")
      .select("event_id", "value").orderBy("event_id").collect().toSeq
    assert(q.orderBy("event_id").collect().toSeq === expected)
  }
}
