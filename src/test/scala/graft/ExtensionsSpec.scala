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

  test("full SQL function surface evaluates from spark.sql") {
    GraftSession.table(spark, sfDir, "documents").createOrReplaceTempView("docs_sql")
    val r = spark.sql(
      """SELECT simhash32(text) AS h32, simhash64(text) AS h64,
        |  hamming_distance(simhash32(text), simhash32(text)) AS d0,
        |  top_token_count(text) AS topn,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp
        |FROM docs_sql LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getString(0).length == 32 && row.getString(0).forall(c => c == '0' || c == '1'))
      assert(row.getString(1).length == 64)
      assert(row.getLong(2) == 0L)
      assert(row.getLong(3) >= 1L)
      assert(row.getDouble(4) == 11.0)
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

  test("hamming_distance is character-level: non-ASCII and unequal lengths") {
    import spark.implicits._
    val got = spark.sql(
      """SELECT hamming_distance('é', 'a') AS non_ascii,
        |  hamming_distance('abc', 'abcd') AS longer,
        |  hamming_distance('0110', '0011') AS bits""".stripMargin)
      .as[(Long, Long, Long)].head()
    // 'é' is 2 UTF-8 bytes but ONE character — a byte scan would say 2
    assert(got == ((1L, 1L, 2L)), got.toString)
  }

  test("topK aggregate is NaN-deterministic regardless of arrival order") {
    import spark.implicits._
    // NaN sorts greatest under Double.compareTo — it must win the top slot
    // whether it arrives before or after the finite value, in any partition
    for (vals <- Seq(Seq(5.0, Double.NaN), Seq(Double.NaN, 5.0))) {
      val got = vals.toDF("v").repartition(2)
        .agg(graft.functions.TopKAgg.topK(col("v"), 1).as("t"))
        .as[Seq[Double]].head()
      assert(got.length == 1 && got.head.isNaN, s"$vals -> $got")
    }
  }

  test("top-token count ignores empty tokens from whitespace runs") {
    import spark.implicits._
    val got = Seq("a b  c   d", "x x  y").toDF("t")
      .select(graft.functions.ShingleExpressions.topTokenCount(col("t")))
      .as[Long].collect().toSeq
    // 'a b  c   d' has 3 empty tokens; the top REAL token count is 1.
    // 'x x  y' keeps x=2 (empties don't inflate past real tokens either).
    assert(got == Seq(1L, 2L), got.toString)
  }

  test("nano-timestamp pushdown rule fires for events time filters") {
    val plan = GraftSession.table(spark, sfDir, "events")
      .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), plan)
  }
}
