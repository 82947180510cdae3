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
    // 3-arg SQL form = the threshold-bounded variant (Spark's own
    // levenshtein(l, r, threshold) shape): exact at <= k, k+1 above
    val bounded = spark.sql(
      "SELECT damerau_levenshtein('ca', 'abc', 2), damerau_levenshtein('abcdefgh', 'zzzzzzzz', 3)")
      .collect().head
    assert(bounded.getInt(0) === 2 && bounded.getInt(1) === 4)
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.DamerauLevenshtein.damerauLevenshtein(col("a"), col("b")))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("boundedDistance: exact at or below k, pinned to k+1 above, on the full fixture") {
    // the threshold contract the bounded linkage verifier leans on: for
    // EVERY k, bounded == full when full <= k, and EXACTLY k+1 otherwise
    fixture.foreach { case (a, b, expected) =>
      (0 to 10).foreach { k =>
        val got = graft.functions.DamerauLevenshtein.boundedDistance(a, b, k)
        val want = if (expected <= k) expected else k + 1
        assert(got === want, s"bounded($a, $b, k=$k): got $got want $want (full $expected)")
      }
    }
    // the variant-distinguishing transposition case survives the band
    assert(graft.functions.DamerauLevenshtein.boundedDistance("ca", "abc", 2) === 2)
    assert(graft.functions.DamerauLevenshtein.boundedDistance("ca", "abc", 1) === 2)
  }

  test("boundedDistance: randomized agreement with the full DP (band + early-abandon fuzz)") {
    // seeded fuzz over a small alphabet (repeats + transpositions are
    // likely) and mixed lengths, so band edges, the length gate, and the
    // row-min abandon all fire; 64-char pairs mirror the linkage probe
    val rnd = new scala.util.Random(42)
    def word(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (1 to 400).foreach { _ =>
      val a = word(rnd.nextInt(70))
      val b =
        if (rnd.nextBoolean()) word(rnd.nextInt(70))
        else { // near-dup: mutate a few positions of a
          val sb = new StringBuilder(a)
          (0 until rnd.nextInt(6)).foreach { _ =>
            if (sb.nonEmpty) sb.setCharAt(rnd.nextInt(sb.length), ('a' + rnd.nextInt(4)).toChar)
          }
          sb.toString
        }
      val full = graft.functions.DamerauLevenshtein.distance(a, b)
      val k = rnd.nextInt(12)
      val got = graft.functions.DamerauLevenshtein.boundedDistance(a, b, k)
      val want = if (full <= k) full else k + 1
      assert(got === want, s"fuzz mismatch: a=$a b=$b k=$k full=$full got=$got")
    }
  }

  test("bounded expression filters identically to the full expression at the threshold") {
    val df = fixture.toDF("a", "b", "expected")
    val viaFull = df.select(col("a"), col("b"),
        graft.functions.DamerauLevenshtein.damerauLevenshtein(col("a"), col("b")).as("dl"))
      .filter(col("dl") <= 3).collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val viaBounded = df.select(col("a"), col("b"),
        graft.functions.DamerauLevenshtein.damerauLevenshteinBounded(col("a"), col("b"), 3).as("dl"))
      .filter(col("dl") <= 3).collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(viaFull === viaBounded)
    // nulls propagate through the bounded codegen path too
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.DamerauLevenshtein.damerauLevenshteinBounded(col("a"), col("b"), 3))
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
