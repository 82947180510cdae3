package graft

class SparkEntrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql cover each other exactly") {
    // the ONLY queries allowed to ship without a SQL oracle: iterative
    // merge-loop semantics with no SQL form, spec-verified in BpeSpec.
    // Any new rows-only query must be added here deliberately — the
    // default remains "no oracle, no ship".
    val rowsOnly = Set("bpe_merges", "bpe_encode_stats")
    val noQuery = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(noQuery.isEmpty, s"oracleSql without query: $noQuery")
    val unGated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(unGated.isEmpty, s"query without oracle (would ship unverified): $unGated")
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet),
      s"stale rows-only allowlist: ${rowsOnly -- SparkEntry.queries.keySet}")
    val grewOracle = rowsOnly.intersect(SparkEntry.oracleSql.keySet)
    assert(grewOracle.isEmpty,
      s"rows-only query now has an oracle — drop it from the allowlist: $grewOracle")
  }

  test("every query runs at sf0.001 and has a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.distinct.length == df.columns.length, s"$name has duplicate columns")
    }
  }
}
