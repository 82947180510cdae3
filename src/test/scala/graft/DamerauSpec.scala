package graft

import org.apache.spark.sql.functions._

/** Pins the unrestricted Damerau-Levenshtein expression to DuckDB's
  * convention via a generated fixture (107 pairs incl. the
  * variant-distinguishing cases: ca/abc = 2 where OSA says 3), the
  * expression/SQL paths, and the blocked-linkage shape.
  */
class DamerauSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture: Seq[(String, String, Int)] =
    scala.io.Source.fromFile("src/test/resources/damerau_fixture.tsv")
      .getLines().map { line =>
        val p = line.split("\t", -1)
        (p(0), p(1), p(2).toInt)
      }.toSeq

  test("distance matches the DuckDB fixture exactly (true DL, not OSA)") {
    assert(fixture.length >= 100)
    fixture.foreach { case (a, b, expected) =>
      val got = graft.functions.DamerauLevenshtein.distance(a, b)
      assert(got === expected, s"mismatch on ($a, $b)")
    }
    // the variant-distinguishing case, asserted by name
    assert(graft.functions.DamerauLevenshtein.distance("ca", "abc") === 2)
  }

  test("expression + SQL paths agree with the static helper, nulls propagate") {
    val df = fixture.toDF("a", "b", "expected")
    df.select(col("expected"),
      graft.functions.DamerauLevenshtein.damerauLevenshtein(col("a"), col("b")).as("dl"))
      .collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
    val viaSql = spark.sql("SELECT damerau_levenshtein('teh', 'the') AS d").collect().head
    assert(viaSql.getInt(0) === 1)
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.DamerauLevenshtein.damerauLevenshtein(col("a"), col("b")))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("damerauLinkage: blocking confines, integer threshold keeps near pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps ovre the lazy dog"), // 1 transposition
      (3L, "the quick brown completely different tail xyz abc def"),
      (4L, "a wholly different block"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.damerauLinkage(docs, col("doc_id"), col("text"),
      16, 64, 8).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getInt(2) === 1)
    assert(!pairs.contains((1L, 3L))) // same block, distance > 8
  }
}
