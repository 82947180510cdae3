package graft.util

/** Text surgery on Spark plan strings, shared by the bench fingerprint and
  * the plan-audit specs.
  */
object PlanText {

  /** The fingerprint TEXT for an optimized plan: the plan string with every
    * InMemoryRelation's runtime reprint stripped ([[stripCachedReprints]]),
    * PLUS each cached subtree's declared LOGICAL plan appended (ADVICE r14:
    * stripping alone made the fingerprint blind to changes INSIDE a
    * shareLazily-cached subtree — a real regression in the linkage
    * (id, probe) projection or the bigram marginals base kept the same
    * hash, letting floors min-merge across a plan change). The appended
    * text is `CachedRDDBuilder.logicalPlan` — the ANALYZED plan captured at
    * cache registration, a pure function of the declared query (no AQE
    * stage ids / coalesce counts, which live only in the physical reprint).
    * Appended blocks are themselves reprint-stripped (a cached plan can
    * embed an inner InMemoryRelation whose string form reprints physical
    * runtime state), and the caller applies the same id normalizations to
    * the whole text. */
  def fingerprintText(optimized: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): String = {
    // recursive: a cached plan can itself read another InMemoryRelation
    // (cache substitution runs before registration), and a fingerprint
    // blind one level down would re-open the same gap one nesting deeper
    def cachedLogical(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
      p.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          val inner = r.cacheBuilder.logicalPlan
          stripCachedReprints(inner.toString) +: cachedLogical(inner)
      }.flatten
    val cached = cachedLogical(optimized)
    stripCachedReprints(optimized.toString) +
      (if (cached.isEmpty) ""
       else cached.mkString("== cached logical ==\n", "\n", ""))
  }

  /** Drop every InMemoryRelation's cached-plan reprint from a plan string.
    *
    * An InMemoryRelation is a LEAF in the logical/physical tree, but its
    * string form reprints the cached physical plan as innerChildren — and
    * that reprint is NOT a function of the declared plan shape: before
    * first materialization it shows the initial physical plan, afterwards
    * the AQE "Final Plan" section with ShuffleQueryStage ids and
    * AQEShuffleRead coalesce counts that vary across boxes/configs. A
    * fingerprint (or a scan-count audit) over the raw string would churn
    * on those runtime artifacts, so the reprint is cut: keep the
    * InMemoryRelation line itself (its output schema IS declared shape),
    * drop every following line printed DEEPER than it.
    *
    * Depth = index of the first character that isn't tree-drawing
    * (space, ':', '+', '-', '|'): innerChildren always print strictly
    * deeper than their owner, and the next sibling/ancestor returns to a
    * shallower or equal column.
    */
  def stripCachedReprints(plan: String): String = {
    def contentIdx(line: String): Int = {
      val i = line.indexWhere(c => !" :+-|".contains(c))
      if (i < 0) line.length else i
    }
    val out = new StringBuilder
    var cutDeeperThan = -1 // -1 = not inside a reprint
    plan.linesIterator.foreach { line =>
      val idx = contentIdx(line)
      if (cutDeeperThan >= 0 && idx > cutDeeperThan) {
        // inside a cached reprint — dropped
      } else {
        cutDeeperThan = -1
        out.append(line).append('\n')
        if (line.startsWith("InMemoryRelation", idx)) cutDeeperThan = idx
      }
    }
    out.toString
  }
}
