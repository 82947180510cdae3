package graft

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

/** Pins the [[graft.plans.DeferredFrameNode]] COMPOSITION CONTRACT
  * (DeferredSummary.scala): the deferred leaf is an optimization boundary.
  * An operator applied on top of a wrapped registry entry stays ABOVE the
  * leaf — Catalyst cannot push it into the hidden inner plan — so the
  * kernel still computes its full output and the predicate evaluates
  * post-hoc. Correct, never silently wrong, but at corpus scale a library
  * user wanting pushdown must compose on the `graft.analysis` kernel
  * functions directly (the scaladoc steers them there); this suite makes
  * the boundary's observed behavior a pinned fact instead of prose.
  */
class DeferredCompositionSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("a filter on a deferred registry entry stays above the leaf and filters post-hoc") {
    val base = SparkEntry.queries("pagerank")(spark, sfDir)
    // pick a node known to exist, from the kernel's own output
    val full = base.collect()
    assert(full.nonEmpty)
    val target = full.map(_.getLong(0)).min
    val filtered = SparkEntry.queries("pagerank")(spark, sfDir)
      .filter(col("node") === target)
    val opt = filtered.queryExecution.optimizedPlan
    // 1. the leaf survives optimization intact (nothing was pushed into or
    //    through it — it HAS no pushdown surface)
    val leaves = opt.collect { case n: graft.plans.DeferredFrameNode => n }
    assert(leaves.length == 1, s"expected exactly one deferred leaf:\n$opt")
    // 2. the filter is still present ABOVE the leaf: post-hoc evaluation
    //    over the kernel's full output, not predicate pushdown
    val filters = opt.collect { case f: Filter => f }
    assert(filters.nonEmpty, s"outer filter must survive above the leaf:\n$opt")
    assert(filters.exists(_.collectLeaves().exists(
      _.isInstanceOf[graft.plans.DeferredFrameNode])),
      s"the surviving filter must sit on the deferred subtree:\n$opt")
    // 3. semantics are exact: post-hoc filtering equals filtering the
    //    collected full output
    val got = filtered.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = full.filter(_.getLong(0) == target)
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == want)
  }
}
