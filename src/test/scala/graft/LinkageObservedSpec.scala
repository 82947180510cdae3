package graft

import org.apache.spark.sql.functions._

/** Pins the fused linkage drop-accounting (round 15, VERDICT r14 item 1):
  * the observed linkage kernels deliver per-pass (n_blocks, max_occupancy,
  * blocks_dropped, rows_dropped) on their OWN action — no second corpus
  * scan — and the counters equal the standalone `linkageBlockReport` row on
  * the same (key, blockLen, probeLen, maxBlock), both on a synthetic
  * boilerplate corpus where the cap BINDS and on gate data where it must
  * not. Pair results are also pinned equal to the unobserved kernels:
  * observability must never change answers.
  */
class LinkageObservedSpec extends SparkSpec {
  import spark.implicits._

  private def reportRows(df: org.apache.spark.sql.DataFrame, blockLen: Int,
                         probeLen: Int, maxBlock: Int): Map[String, (Long, Long, Long, Long)] =
    graft.dedup.Dedup.linkageBlockReport(df, col("doc_id"), col("text"),
        blockLen, probeLen, maxBlock)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  private def obsTuple(o: graft.dedup.CapCounters): (Long, Long, Long, Long) = {
    val m = o.get
    (m("n_blocks").asInstanceOf[Long], m("max_occupancy").asInstanceOf[Long],
      m("blocks_dropped").asInstanceOf[Long], m("rows_dropped").asInstanceOf[Long])
  }

  test("synthetic boilerplate corpus: the cap fires and the observed counters equal the report") {
    // 30 docs share a 16-char boilerplate prefix but diverge afterwards
    // (hot PREFIX block, discriminative sorted-token keys), plus 4 docs in
    // healthy blocks; maxBlock=10 drops exactly the hot prefix block
    val boiler = (1 to 30).map(i => (i.toLong, f"BOILERPLATE HDR body $i%03d unique tail ${i * 7}%04d"))
    val healthy = Seq(
      (101L, "alpha bravo charlie delta echo"),
      (102L, "alpha bravo charlie delta echo!"),
      (201L, "zulu yankee xray whiskey victor"),
      (202L, "zulu yankee xray whiskey victor!"))
    val docs = (boiler ++ healthy).toDF("doc_id", "text")
    val report = reportRows(docs, 16, 64, 10)
    assert(report("prefix")._3 >= 1L, s"fixture must trip the prefix cap: $report")
    assert(report("prefix")._4 >= 30L)

    val (pairs, pObs, sObs) = graft.dedup.Dedup.jaroWinklerLinkageObserved(
      docs, col("doc_id"), col("text"), 16, 64, 0.9, maxBlock = 10)
    val observedPairs = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(obsTuple(pObs) === report("prefix"),
      s"prefix counters: obs=${obsTuple(pObs)} report=${report("prefix")}")
    assert(obsTuple(sObs) === report("sorted_tokens"),
      s"sorted-token counters: obs=${obsTuple(sObs)} report=${report("sorted_tokens")}")

    // observability never changes answers: same pairs as the plain kernel
    val plainPairs = graft.dedup.Dedup.jaroWinklerLinkage(
        docs, col("doc_id"), col("text"), 16, 64, 0.9, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(observedPairs === plainPairs)
    // the healthy near-pairs survive; boilerplate pairs were dropped with
    // their block
    assert(plainPairs.contains((101L, 102L)) && plainPairs.contains((201L, 202L)))
    assert(!plainPairs.exists { case (a, b) => a <= 30L && b <= 30L })
    org.apache.spark.sql.graft.Bridge.releaseShared()
  }

  test("everything-dropped corpus: the query folds empty, the counters still account for every drop") {
    // every doc shares BOTH block keys (identical 64-char probe region) →
    // the single block in each pass is hot at maxBlock=10 → zero
    // candidates; AQE folds the zero-result plan before the observed
    // stages run, and the CapCounters fallback must deliver the exact
    // accounting anyway — the no-silent-cap contract in its hardest corner
    val docs = (1 to 30).map(i =>
      (i.toLong, f"SHARED BOILERPLATE PREAMBLE THAT FILLS THE WHOLE PROBE REGION VERBATIM... tail $i%03d"))
      .toDF("doc_id", "text")
    val report = reportRows(docs, 16, 64, 10)
    assert(report("prefix") === ((1L, 30L, 1L, 30L)), s"fixture must drop everything: $report")
    assert(report("sorted_tokens") === ((1L, 30L, 1L, 30L)))
    val (pairs, pObs, sObs) = graft.dedup.Dedup.jaroWinklerLinkageObserved(
      docs, col("doc_id"), col("text"), 16, 64, 0.9, maxBlock = 10)
    assert(pairs.collect().isEmpty)
    assert(obsTuple(pObs) === report("prefix"))
    assert(obsTuple(sObs) === report("sorted_tokens"))
    org.apache.spark.sql.graft.Bridge.releaseShared()
  }

  test("gate data: observed DL linkage matches the plain kernel and the cap stays silent-free at zero") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val report = reportRows(docs, 16, 64, 1000)
    assert(report("prefix")._3 === 0L && report("sorted_tokens")._3 === 0L,
      s"gate data must not trip the cap: $report")

    val (pairs, pObs, sObs) = graft.dedup.Dedup.damerauLinkageObserved(
      docs, col("doc_id"), col("text"), 16, 64, 8, maxBlock = 1000)
    val observed = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(obsTuple(pObs) === report("prefix"))
    assert(obsTuple(sObs) === report("sorted_tokens"))

    val plain = graft.dedup.Dedup.damerauLinkage(
        docs, col("doc_id"), col("text"), 16, 64, 8, maxBlock = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(observed === plain)
    org.apache.spark.sql.graft.Bridge.releaseShared()
  }
}
