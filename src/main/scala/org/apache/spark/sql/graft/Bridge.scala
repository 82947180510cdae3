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
    * the entry itself persists. One-shot drivers (the bench/verify
    * contract mains, batch jobs) never notice; a LONG-LIVED session
    * running these kernels over many DISTINCT inputs should bound growth
    * with `spark.catalog.clearCache()` between workloads or `unpersist`
    * on frames it holds. The `isCached` lookup already keeps REPEATED
    * constructions over the same input from stacking duplicates. */
  def shareLazily(df: DataFrame): DataFrame =
    if (isCached(df)) df
    else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
}
