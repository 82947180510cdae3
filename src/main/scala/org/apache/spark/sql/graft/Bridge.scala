package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column<->Expression converters, so graft
  * can expose custom Catalyst expressions through the public Column API.
  * (Spark 4 removed the public Column(Expression) constructor with the
  * Connect refactor; ExpressionUtils is the classic-session path.)
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Whether `df`'s plan already has a CacheManager entry. Lets an
    * idempotent kernel-level `.persist()` (the rfm per-user frame) skip the
    * re-registration that logs "Asked to cache already cached data" on
    * every re-construction of the same query. */
  def isCached(df: DataFrame): Boolean = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    ds.sparkSession.sharedState.cacheManager
      .lookupCachedData(ds.sparkSession, ds.queryExecution.analyzed).isDefined
  }

  /** Bind a multiply-consumed subtree to ONE materialization without
    * running a job at construction: a LAZY persist, registered in the
    * CacheManager immediately so cache replacement (which happens at
    * analysis, BEFORE column pruning can make the consumer copies
    * canonically unequal and defeat exchange reuse) serves every consumer
    * from the same InMemoryRelation, materialized at first action. The
    * lookup keeps re-constructions of the same query idempotent. This is
    * the kernel-sharing vehicle for NON-iterative multi-consumer frames
    * (rfm's ranked frame, the triangle core); genuinely iterative kernels
    * (pagerank, pointer-jumping components, IRLS) still checkpoint inside
    * a deferred leaf, because their lineage must be TRUNCATED, not shared.
    *
    * Lifetime contract: entries live in the session's CacheManager until
    * explicitly released (unlike checkpoint RDDs, which the ContextCleaner
    * reaps when unreachable) — memory pressure demotes blocks to disk, but
    * the entry itself persists. Every entry is therefore TRACKED here, and
    * [[releaseShared]] is the bounded-growth recipe: one-shot drivers (the
    * bench/verify contract mains) call it after each query's actions, and
    * a long-lived session running these kernels over many DISTINCT inputs
    * calls it between workloads — after which every shared entry is gone
    * (BridgeLifetimeSpec pins both the idempotence and the release). The
    * `isCached` lookup keeps REPEATED constructions over the same input
    * from stacking duplicate entries.
    *
    * NOTE: `spark.catalog.clearCache()` removes the CacheManager entries
    * but does NOT drain this tracker — [[releaseShared]] is the drain. A
    * session that clears the catalog cache directly leaves stale tracked
    * refs behind; they are harmless (re-unpersisting an uncached frame is
    * a no-op) and are PRUNED by the first [[shareLazily]] call that finds
    * the tracker past [[PruneThreshold]], so the tracker cannot grow past
    * the live-entry count plus the threshold plus one workload's
    * registrations. */
  def shareLazily(df: DataFrame): DataFrame = {
    // Stale-ref pruning is THROTTLED (round 15): pruning on every call is
    // an isCached (CacheManager lookup = plan canonicalization) per tracked
    // entry per registration — O(n²) canonicalizations across a workload
    // registering n frames, a quiet constant on plan-construction paths the
    // repo otherwise keeps work-free. Stale refs only exist after a caller
    // bounded cache growth with clearCache() instead of releaseShared(),
    // and they are harmless until the tracker grows — so prune only once
    // the tracker exceeds the largest single-workload registration count
    // (the bounded-growth contract survives: the tracker can never exceed
    // the live-entry count plus this threshold).
    if (sharedFrames.size > PruneThreshold) pruneStale()
    if (isCached(df)) df
    else {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sharedFrames.add(p)
      p
    }
  }

  /** Tracked-entry count above which [[shareLazily]] prunes stale refs —
    * comfortably above any single query's registrations (the widest kernel
    * registers 3), so the common path (construct → act → releaseShared)
    * never pays a pruning pass. */
  private val PruneThreshold = 8

  // Strong refs are fine: the registry is drained by releaseShared (and
  // entries whose plans left the CacheManager by other means — e.g. a
  // caller's clearCache() — are pruned on the next shareLazily), so
  // between drains the CacheManager itself already holds the same plans.
  private val sharedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Drop tracked entries whose plans are no longer in the CacheManager —
    * a caller that bounded cache growth with clearCache() (instead of
    * [[releaseShared]]) must not leak tracked plan objects. */
  private def pruneStale(): Unit = {
    val it = sharedFrames.iterator()
    while (it.hasNext) {
      val d = it.next()
      val gone =
        try !isCached(d)
        catch { case scala.util.control.NonFatal(_) => true }
      if (gone) it.remove()
    }
  }

  /** Number of tracked (not-yet-released) shareLazily registrations —
    * test instrumentation for the bounded-growth contract. */
  def sharedCount: Int = sharedFrames.size

  /** Release every cache entry [[shareLazily]] registered since the last
    * drain. Non-blocking unpersist: block eviction proceeds async while the
    * CacheManager entry is removed immediately, so a re-construction of the
    * same kernel after release re-registers (and re-materializes) cleanly.
    * Safe to call concurrently and when nothing is registered. */
  def releaseShared(): Unit = {
    var d = sharedFrames.poll()
    while (d != null) {
      try { d.unpersist(blocking = false); () }
      catch { case scala.util.control.NonFatal(_) => () }
      d = sharedFrames.poll()
    }
  }
}
