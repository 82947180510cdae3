package graft.util

/** Text surgery on Spark plan strings, shared by the bench fingerprint and
  * the plan-audit specs.
  */
object PlanText {

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
