package graft

/** Engine outputs must be a function of the DATA, not the session tuning:
  * the same query must produce identical rows with AQE disabled and with a
  * different shuffle-partition count. This pins the two config classes
  * that change physical structure at runtime — partition counts move
  * range/hash boundaries (the two-phase rank operators tag rows with
  * partition ids and MUST be boundary-invariant), and AQE rewrites
  * exchanges/joins mid-flight. Both knobs are runtime-settable; each
  * variant runs in a CLONED session (own SQLConf, shared context) so the
  * toggles are invisible to suites sharing the SparkSpec session under
  * parallel test execution.
  */
class ConfigInvarianceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose plans exercise the structure-sensitive machinery:
  // two-phase ranks (partition-id offsets), global stats broadcasts,
  // band-bucket joins, windowed reassembly, percentile cutpoints
  private val probes = Seq("value_ntiles_dist", "rfm_segments_dist",
    "ks_drift", "kaplan_meier",
    "rfm_segments", "dedup_minhash_lsh", "line_dedup", "topk_movers",
    "mad_outliers", "psi_drift", "seq_packing")

  private def canon(name: String,
                    confs: (String, String)*): Seq[String] = {
    val s = if (confs.isEmpty) spark else {
      val s2 = spark.newSession()
      confs.foreach { case (k, v) => s2.conf.set(k, v) }
      s2
    }
    val df = SparkEntry.queries(name)(s, sfDir)
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString).mkString("|"))
      .toSeq.sorted
  }

  test("results are identical with AQE disabled") {
    for (q <- probes) {
      val base = canon(q)
      val noAqe = canon(q, "spark.sql.adaptive.enabled" -> "false")
      assert(noAqe == base, s"$q changes output when AQE is off")
    }
  }

  test("results are identical under a different shuffle-partition count") {
    // 7 is coprime to the default 32 and odd, so every hash/range boundary
    // moves; the two-phase rank operators must still emit the same rows
    for (q <- probes) {
      val base = canon(q)
      val p7 = canon(q, "spark.sql.shuffle.partitions" -> "7")
      assert(p7 == base, s"$q changes output at shuffle.partitions=7")
    }
  }
}
