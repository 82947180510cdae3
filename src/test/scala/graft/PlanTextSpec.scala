package graft

import org.apache.spark.sql.functions._

/** Pins the bench fingerprint's cached-subtree visibility (ADVICE r14):
  * `PlanText.fingerprintText` must CHANGE when a plan changes INSIDE a
  * shareLazily-cached subtree, even though the InMemoryRelation leaf's own
  * line (output schema) is identical — the reprint-stripping alone was
  * blind there, letting floors min-merge across a real regression. Also
  * pins that the mixed-in text is the declared LOGICAL plan: two
  * constructions of the SAME query fingerprint identically (no runtime
  * AQE artifacts leak in — the cross-config probe in
  * tmp/planhash_xconfig_r15.log is the full-engine version of that
  * assertion).
  */
class PlanTextSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String = s.replaceAll("#\\d+", "#x")

  private def fpOf(probeLen: Int): String = {
    val docs = (1 to 50).map(i => (i.toLong, s"some document text payload number $i with a tail"))
      .toDF("doc_id", "text")
    val base = org.apache.spark.sql.graft.Bridge.shareLazily(
      docs.select(col("doc_id").as("id"), substring(col("text"), 1, probeLen).as("probe")))
    val q = base.groupBy(substring(col("probe"), 1, 4).as("blk"))
      .agg(count(lit(1)).as("n"))
    val fp = norm(graft.util.PlanText.fingerprintText(q.queryExecution.optimizedPlan))
    org.apache.spark.sql.graft.Bridge.releaseShared()
    fp
  }

  test("a change inside a cached subtree changes the fingerprint; identical plans don't") {
    val fp64a = fpOf(64)
    val fp64b = fpOf(64)
    val fp32 = fpOf(32)
    // same declared query -> same fingerprint across constructions
    assert(fp64a === fp64b)
    // the cached projection differs ONLY inside the InMemoryRelation (the
    // leaf's output schema is identical: same column names/types), so the
    // strip-only text is blind to it...
    assert(fp64a !== fp32, "fingerprint must see inside the cached subtree")
    // ...and the difference comes from the mixed-in cached LOGICAL plan,
    // which both fingerprints must carry
    assert(fp64a.contains("== cached logical ==") && fp32.contains("== cached logical =="))
  }
}
