package graft

import org.apache.spark.sql.functions._

/** Pins the simhash bucket-cap accounting (round 15, VERDICT r14 item 5):
  * `simhashPairs64Observed` delivers (n_buckets, max_bucket,
  * buckets_dropped, rows_dropped) on the caller's own action, equal to the
  * standalone `simhashBucketReport` over the same banded frame — so the
  * opt-in `maxBucketSize` cap is never silent when enabled. Asserted on a
  * synthetic hot-bucket corpus where the cap BINDS, on gate data with a
  * healthy cap where every drop counter must be zero, and on the
  * everything-dropped corpus whose query folds EMPTY before the riding
  * metrics run (the CapCounters fallback corner). Pair results are pinned
  * equal to the unobserved kernel throughout.
  */
class SimhashObservedSpec extends SparkSpec {
  import spark.implicits._

  private def reportTuple(df: org.apache.spark.sql.DataFrame,
                          cap: Long): (Long, Long, Long, Long) = {
    val r = graft.dedup.Dedup.simhashBucketReport(
      df, col("doc_id"), col("text"), numBands = 4, maxBucketSize = cap).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def obsTuple(o: graft.dedup.CapCounters): (Long, Long, Long, Long) = {
    val m = o.get
    (m("n_buckets").asInstanceOf[Long], m("max_bucket").asInstanceOf[Long],
      m("buckets_dropped").asInstanceOf[Long], m("rows_dropped").asInstanceOf[Long])
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("synthetic hot-bucket corpus: the cap fires and the observed counters say exactly what it dropped") {
    // 25 identical texts hash to ONE simhash — every band bucket they form
    // holds 25 members, so maxBucketSize=10 drops all 4 of their buckets
    // (100 banded rows); the healthy identical pair below survives in its
    // own 2-member buckets (hamming 0)
    val hot = (1 to 25).map(i => (i.toLong, "identical boilerplate body that every record repeats verbatim"))
    val healthy = Seq(
      (101L, "a perfectly ordinary document about spark physical planning"),
      (102L, "a perfectly ordinary document about spark physical planning"))
    val docs = (hot ++ healthy).toDF("doc_id", "text")
    val cap = 10L
    val want = reportTuple(docs, cap)
    assert(want._3 === 4L && want._4 === 100L, s"fixture must trip the bucket cap: $want")

    val (pairs, counters) = graft.dedup.Dedup.simhashPairs64Observed(
      docs, col("doc_id"), col("text"), numBands = 4, maxHamming = 3, maxBucketSize = cap)
    val observedPairs = pairSet(pairs)
    assert(obsTuple(counters) === want, s"obs=${obsTuple(counters)} want=$want")

    // observability never changes answers: same pairs as the plain capped
    // kernel — the hot-bucket identicals are dropped, the healthy pair kept
    val plainPairs = pairSet(graft.dedup.Dedup.simhashPairs64(
      docs, col("doc_id"), col("text"), numBands = 4, maxHamming = 3, maxBucketSize = cap))
    assert(observedPairs === plainPairs)
    assert(plainPairs.contains((101L, 102L, 0L)))
    assert(!plainPairs.exists { case (a, b, _) => a <= 25L && b <= 25L })
    org.apache.spark.sql.graft.Bridge.releaseShared()
  }

  test("everything-dropped corpus: the query folds empty, the counters still account for every drop") {
    // ALL docs share one simhash → every bucket is hot → zero pairs; AQE
    // folds the zero-result plan before the observed stage runs, and the
    // CapCounters fallback must deliver the exact accounting anyway —
    // the no-silent-cap contract in its hardest corner
    val docs = (1 to 30).map(i => (i.toLong, "identical boilerplate body that every record repeats verbatim"))
      .toDF("doc_id", "text")
    val cap = 10L
    val want = reportTuple(docs, cap)
    assert(want === ((4L, 30L, 4L, 120L)), s"fixture must drop everything: $want")
    val (pairs, counters) = graft.dedup.Dedup.simhashPairs64Observed(
      docs, col("doc_id"), col("text"), numBands = 4, maxHamming = 3, maxBucketSize = cap)
    assert(pairs.collect().isEmpty)
    assert(obsTuple(counters) === want)
    org.apache.spark.sql.graft.Bridge.releaseShared()
  }

  test("gate data with a healthy cap: zero drops observed, pairs identical to the unobserved kernel") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val cap = 1000L
    val want = reportTuple(docs, cap)
    assert(want._3 === 0L && want._4 === 0L, s"gate data must not trip the cap: $want")

    val (pairs, counters) = graft.dedup.Dedup.simhashPairs64Observed(
      docs, col("doc_id"), col("text"), numBands = 4, maxHamming = 3, maxBucketSize = cap)
    val observedPairs = pairSet(pairs)
    assert(obsTuple(counters) === want)

    val plainPairs = pairSet(graft.dedup.Dedup.simhashPairs64(
      docs, col("doc_id"), col("text"), numBands = 4, maxHamming = 3, maxBucketSize = cap))
    assert(observedPairs === plainPairs)
    org.apache.spark.sql.graft.Bridge.releaseShared()
  }
}
