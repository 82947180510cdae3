package graft

import org.apache.spark.sql.functions._

/** The SQL surface registered by GraftExtensions must match the Column API. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("token_count is callable from SQL and equals the Column API") {
    GraftSession.table(spark, sfDir, "documents").createOrReplaceTempView("docs_v")
    val sql = spark.sql("SELECT doc_id, token_count(text) AS n FROM docs_v")
      .as[(Long, Long)].collect().toMap
    val api = GraftSession.table(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.TokenCount.tokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sql == api)
  }

  test("minhash_sig and bottomk_fingerprint are callable from SQL") {
    GraftSession.table(spark, sfDir, "documents").createOrReplaceTempView("docs_v")
    val rows = spark.sql(
      "SELECT doc_id, minhash_sig(text) AS sig, bottomk_fingerprint(text) AS fp, " +
        "size(distinct_shingles(text)) AS nsh FROM docs_v WHERE doc_id < 5")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getSeq[Long](1).length == 16)
      assert(r.getString(2).nonEmpty)
      assert(r.getInt(3) > 0)
    }
  }

  test("SQL function builders reject wrong arity with a clear signature message") {
    GraftSession.table(spark, sfDir, "documents").createOrReplaceTempView("docs_v")
    val cases = Seq(
      "SELECT token_count(text, 2) FROM docs_v",          // extra arg
      "SELECT minhash_sig(text, 8) FROM docs_v",          // would silently drop 8
      "SELECT distinct_shingles(text, 2, 3) FROM docs_v", // extra arg
      "SELECT bottomk_fingerprint(text, 3) FROM docs_v")  // partial size args
    cases.foreach { q =>
      val e = intercept[Exception](spark.sql(q).collect())
      assert(e.getMessage.contains("expected"), s"$q -> ${e.getMessage}")
    }
  }

  test("nano-timestamp pushdown rule fires for events time filters") {
    val plan = GraftSession.table(spark, sfDir, "events")
      .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), plan)
  }
}
