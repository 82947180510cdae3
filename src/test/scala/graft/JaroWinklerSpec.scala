package graft

import org.apache.spark.sql.functions._

/** Pins the native Jaro-Winkler expression to the DuckDB/RapidFuzz
  * convention via a generated fixture (129 pairs: random, mutated
  * near-dups, and the textbook/edge cases — src/test/resources/
  * jaro_winkler_fixture.tsv, values from DuckDB 1.0.0's
  * jaro_winkler_similarity), plus the blocked-linkage operator shape.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val fixture: Seq[(String, String, Double)] =
    scala.io.Source.fromFile("src/test/resources/jaro_winkler_fixture.tsv")
      .getLines().map { line =>
        val parts = line.split("\t", -1)
        (parts(0), parts(1), parts(2).toDouble)
      }.toSeq

  test("similarity matches the DuckDB fixture at 6 decimals (and ~1e-9 raw)") {
    assert(fixture.length >= 100)
    fixture.foreach { case (a, b, expected) =>
      val got = graft.functions.JaroWinkler.similarity(a, b)
      assert(math.abs(got - expected) < 1e-9,
        s"raw mismatch on ($a, $b): got $got expected $expected")
      assert(q6(got) === q6(expected), s"r6 mismatch on ($a, $b)")
    }
  }

  test("expression path (codegen + interpreted) agrees with the static helper") {
    val df = fixture.toDF("a", "b", "expected")
    val rows = df.select(col("expected"),
      graft.functions.JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("jaroWinklerLinkage: blocking confines pairs, threshold on rounded jw") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // same block, near-dup
      (3L, "the quick brown sheep sleeps all day"),        // same block, far
      (4L, "a completely different text altogether"))      // different block
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.jaroWinklerLinkage(docs, col("doc_id"), col("text"),
      16, 64, 0.9).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // never left its block
    assert(out.forall(_.getDouble(2) >= 0.9))
    // the far pair shares the block but fails the verify
    assert(!pairs.contains((1L, 3L)) || {
      graft.functions.JaroWinkler.similarity(
        "the quick brown fox jumps over the lazy dog".take(64),
        "the quick brown sheep sleeps all day".take(64)) >= 0.9
    })
  }

  test("jaroWinklerLinkage: hot boilerplate blocks are dropped, discriminative blocks survive") {
    // The maxBlock guard (round 13): a block past the occupancy cap is
    // quadratic pair fuel with no linkage signal (identical boilerplate
    // prefixes), so it is dropped BEFORE the self-join — the banded-simhash
    // hot-bucket discipline. Sub-cap blocks are untouched.
    val boiler = (1L to 12L).map(i => (i, s"unsubscribe here to stop msgs $i"))
    val real = Seq(
      (101L, "maria gonzalez from nairobi office"),
      (102L, "maria gonzalez from nairobi officE"))
    val docs = (boiler ++ real).toDF("doc_id", "text")
    val capped = graft.dedup.Dedup.jaroWinklerLinkage(docs, col("doc_id"), col("text"),
      16, 64, 0.9, maxBlock = 10).collect()
    val pairs = capped.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((101L, 102L)),
      s"hot block must be dropped, real pair kept: $pairs")
    // without the cap the boilerplate block contributes its 66 pairs
    val uncapped = graft.dedup.Dedup.jaroWinklerLinkage(docs, col("doc_id"), col("text"),
      16, 64, 0.9, maxBlock = 1000).collect()
    assert(uncapped.length > capped.length)
  }

  test("jaroWinklerLinkage: sorted-token pass reaches word-order variants the prefix block misses") {
    // round 14 recall pass: "Smith, John"-style word-order variants have
    // DIFFERENT 16-char prefixes (no prefix block can pair them) but the
    // SAME sorted-token key over the probe region — the second blocking
    // pass makes them candidates, and JW (high on a shared long tail)
    // verifies them.
    val common = "record 4471 client file archived group west region xy"  // 53 chars
    val a = s"smith john $common"
    val b = s"john smith $common"
    assert(a.length == 64 && b.length == 64)
    assert(a.take(16) != b.take(16), "prefix blocks must differ for this test to bite")
    // precondition: the verifier itself clears the threshold
    assert(graft.functions.JaroWinkler.similarity(a, b) >= 0.9)
    val docs = Seq((1L, a), (2L, b), (3L, "entirely unrelated content")).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.jaroWinklerLinkage(docs, col("doc_id"), col("text"),
      16, 64, 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"word-order variant must be reachable: $pairs")
    // the union dedups across passes: same-prefix near-dups (caught by
    // BOTH passes when token sets also agree) appear exactly once
    val dup = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val dupPairs = graft.dedup.Dedup.jaroWinklerLinkage(dup, col("doc_id"), col("text"),
      16, 64, 0.9).collect()
    assert(dupPairs.length == 1, s"cross-pass pair dedup: ${dupPairs.length}")
  }

  test("linkageBlockReport: drop accounting fires on hot blocks, reads zero on gate data") {
    // The cap must never be silent (ADVICE r13): the report counts the
    // blocks/rows the kernels' occupancy guard excludes, per blocking pass.
    val boiler = (1L to 12L).map(i => (i, s"unsubscribe here to stop msgs $i"))
    val real = Seq(
      (101L, "maria gonzalez from nairobi office"),
      (102L, "maria gonzalez from nairobi officE"))
    val docs = (boiler ++ real).toDF("doc_id", "text")
    val rep = graft.dedup.Dedup.linkageBlockReport(docs, col("doc_id"), col("text"),
      16, 64, 10).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // prefix pass: the 12-member boilerplate block exceeds maxBlock=10
    val (nb, maxOcc, blocksDropped, rowsDropped) = rep("prefix")
    assert(maxOcc == 12L && blocksDropped == 1L && rowsDropped == 12L, rep.toString)
    assert(nb == 2L) // the boilerplate block + the shared "maria gonzalez f" block
    // sorted-token pass: every boilerplate doc has a distinct trailing id
    // token, so no token block is hot
    assert(rep("sorted_tokens")._3 == 0L, rep.toString)
    // gate data: the registered report (16/64/1000) must read ZERO drops —
    // the cap provably does not bind on the corpus the gate verifies
    val gate = SparkEntry.queries("linkage_block_report")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(gate.values.forall(v => v._1 == 0L && v._2 == 0L),
      s"occupancy cap must not bind on gate data: $gate")
  }
}
