package graft

import org.apache.spark.sql.functions._

/** Pins the round-8 evaluation + sampling additions: classifier report
  * arithmetic, Cohen's kappa on the textbook example, path trigram counts,
  * bounded bottom-k sampling (window equivalence + merge independence),
  * and the as-of tolerance gate.
  */
class EvalSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("classifierReport: confusion marginals, nulls excluded, union classes") {
    // gold: a a a b b c(null pred) ; pred: a a b b b d
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"),
      ("c", null), (null, "d"), ("c", "d")
    ).toDF("gold", "pred")
    val out = graft.analysis.Eval.classifierReport(df, col("gold"), col("pred"))
      .orderBy("lang")
      .select("lang", "n_gold", "n_pred", "tp", "precision", "recall", "f1")
      .collect()
    // kept rows: (a,a) (a,a) (a,b) (b,b) (b,b) (c,d)
    val byLang = out.map(r => r.getString(0) -> r).toMap
    assert(byLang.keySet === Set("a", "b", "c", "d"))
    val a = byLang("a")
    assert(a.getLong(1) === 3 && a.getLong(2) === 2 && a.getLong(3) === 2)
    assert(a.getDouble(4) === 1.0) // precision 2/2
    assert(a.getDouble(5) === 0.666667) // recall 2/3 r6
    val c = byLang("c")
    assert(c.getLong(1) === 1 && c.getLong(2) === 0 && c.getLong(3) === 0)
    assert(c.isNullAt(4)) // precision undefined: never predicted
    assert(c.getDouble(5) === 0.0)
    val d = byLang("d")
    assert(d.getLong(1) === 0 && d.isNullAt(5)) // recall undefined: no gold
    assert(d.getDouble(4) === 0.0)
  }

  test("cohenKappa: textbook 2x2 example and degenerate all-agree case") {
    // classic example: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
        Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val out = graft.analysis.Eval.cohenKappa(rows.toDF("a", "b").repartition(7),
      col("a"), col("b")).collect().head
    assert(out.getLong(0) === 50)
    assert(out.getDouble(1) === 0.7) // po = 35/50
    assert(out.getDouble(2) === 0.5) // pe = (25*30 + 25*20)/2500
    assert(out.getDouble(3) === 0.4) // (0.7-0.5)/0.5
    // both coders constant and identical -> pe = 1, kappa undefined (null)
    val degen = graft.analysis.Eval.cohenKappa(
      Seq.fill(10)(("x", "x")).toDF("a", "b"), col("a"), col("b")).collect().head
    assert(degen.getDouble(1) === 1.0 && degen.isNullAt(3))
  }

  test("topPaths: counts ordered trigrams per user, no cross-user bleed") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),
      (3L, 1L, "x"), (3L, 2L, "y") // too short for a trigram
    ).toDF("u", "t", "e")
    val out = graft.analysis.Eval.topPaths(df, col("u"), col("t"), col("t"),
      col("e"), 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(out === Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
  }

  /** The streaming engine's formulation: bottom-k via the typed aggregate
    * (batch `stratifiedSample` itself uses the WindowGroupLimit window). */
  private def viaBottomKAgg(docs: org.apache.spark.sql.DataFrame, k: Int,
                            salt: String) =
    docs.withColumn("__dig", md5(concat(lit(salt + ":"), col("id").cast("string"))))
      .groupBy(col("src"))
      .agg(graft.functions.BottomKAgg.bottomKByKey(col("__dig"), col("id"), k).as("p"))
      .select(col("src"), posexplode(col("p")).as(Seq("pos", "pick")))
      .select(col("src").as("stratum"), (col("pos") + 1).cast("int").as("rank"),
        col("pick.id").as("id"))

  test("bottom-k aggregate equals the window sample; plan gets WindowGroupLimit") {
    val docs = (1L to 500L).map(i => (i, "s" + (i % 3))).toDF("id", "src")
      .repartition(13)
    val sample = graft.curation.Curation
      .stratifiedSample(docs, col("src"), col("id"), 7, "seed1")
    val viaWindow = sample.orderBy("stratum", "rank")
      .as[(String, Int, Long)].collect().toSeq
    val viaAgg = viaBottomKAgg(docs, 7, "seed1").orderBy("stratum", "rank")
      .as[(String, Int, Long)].collect().toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg.size === 21)
    // the rank filter must reach WindowGroupLimit (partial top-k on both
    // shuffle sides) — the property that makes a hot stratum survivable
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("bottom-k sample: partitioning-independent and exhaustive when k >= group") {
    val docs = (1L to 100L).map(i => (i, "only")).toDF("id", "src")
    val a = viaBottomKAgg(docs.repartition(1), 10, "s")
      .as[(String, Int, Long)].collect().toSeq.sorted
    val b = viaBottomKAgg(docs.repartition(17), 10, "s")
      .as[(String, Int, Long)].collect().toSeq.sorted
    assert(a === b)
    assert(a === graft.curation.Curation
      .stratifiedSample(docs, col("src"), col("id"), 10, "s")
      .as[(String, Int, Long)].collect().toSeq.sorted)
    // k >= group size -> every member present exactly once
    val all = viaBottomKAgg(docs.repartition(5), 200, "s")
      .as[(String, Int, Long)].collect().toSeq
    assert(all.map(_._3).sorted === (1L to 100L))
    assert(all.map(_._2).sorted === (1 to 100))
  }

  test("prefixFilterJoin: threshold boundary exact, hot shingles stay out of prefixes") {
    // docs 1/2: identical 5 trigrams -> J = 1. docs 1/3: 2 shared of
    // (5 + 5 - 2) = 8 -> J = 0.25. docs 4/5: 3 shared of 5 -> 0.6.
    val docs = Seq(
      (1L, "a b c d e f g"),            // shingles abc bcd cde def efg (5)
      (2L, "a b c d e f g"),            // identical
      (3L, "a b c d x y z"),            // shares abc bcd
      (4L, "p q r s t u"),              // pqr qrs rst stu (4)
      (5L, "p q r s t v")               // pqr qrs rst stv (4): 3 shared / 5 union = 0.6
    ).toDF("doc_id", "text")
    def pairs(tau: Double) = graft.dedup.Dedup
      .prefixFilterJoin(docs, col("doc_id"), col("text"), 3, tau)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs(0.6) === Seq((1L, 2L, 1.0), (4L, 5L, 0.6))) // 0.6 boundary INCLUDED
    assert(pairs(0.61) === Seq((1L, 2L, 1.0)))
    assert(pairs(0.25) === Seq((1L, 2L, 1.0), (1L, 3L, 0.25),
      (2L, 3L, 0.25), (4L, 5L, 0.6)))
    // prefix shrinkage: with a boilerplate shingle shared by EVERY doc,
    // rarest-first prefixes must not join everything with everything
    val boiler = Seq(
      (1L, "z z z a b c"), (2L, "z z z d e f"), (3L, "z z z g h i"),
      (4L, "z z z j k l"), (5L, "z z z a b c")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup
      .prefixFilterJoin(boiler, col("doc_id"), col("text"), 3, 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 5L, 1.0))) // only the true duplicate survives
  }

  test("tokenEntropy: uniform = ln k, constant = 0, tokenless doc is NULL") {
    val docs = Seq(
      (1L, "a b c d"),       // 4 uniform tokens -> ln 4
      (2L, "a a a a a"),     // single type -> 0
      (3L, "!!! ???")        // no [a-z0-9]+ tokens
    ).toDF("doc_id", "text")
    val out = graft.text.Vocab.tokenEntropy(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 4L)
    assert(math.abs(out(0).getDouble(2) - math.log(4.0)) < 1e-5)
    assert(out(1).getLong(1) === 5L && out(1).getDouble(2) === 0.0)
    assert(out(2).getLong(1) === 0L && out(2).isNullAt(2))
  }

  test("keySkewReport: counts, hottest key, and Herfindahl index") {
    // key 7 x6, key 1 x2, keys 2,3 x1 -> n=10, hhi = (36+4+1+1)/100
    val rows = (Seq.fill(6)(7L) ++ Seq.fill(2)(1L) ++ Seq(2L, 3L, -999L))
      .map(k => Tuple1(if (k == -999L) null.asInstanceOf[java.lang.Long] else java.lang.Long.valueOf(k)))
      .toDF("k")
    val out = graft.analysis.Eval.keySkewReport(rows, col("k")).collect().head
    assert(out.getLong(0) === 10L) // null key excluded
    assert(out.getLong(1) === 4L)
    assert(out.getString(2) === "7" && out.getLong(3) === 6L)
    assert(out.getDouble(4) === 0.6)
    assert(out.getDouble(5) === 0.42)
  }

  test("spanDedupRewrite: first occurrence survives, partials always kept") {
    val block = (1 to 16).map(i => s"w$i").mkString(" ") // one full chunk
    val other = (1 to 16).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block $other tail words"),    // both chunks first here
      (2L, s"$block fresh unique content"), // repeats block -> removed
      (3L, "short doc"),                    // single partial chunk, kept
      (4L, s"$other $other")                // both repeat doc 1's chunk -> gone
    ).toDF("doc_id", "text")
    val out = graft.curation.Curation
      .spanDedupRewrite(docs, col("doc_id"), col("text"), 16)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) === ((1L, 3L, 0L, s"$block $other tail words")))
    assert(out(1) === ((2L, 2L, 1L, "fresh unique content")))
    assert(out(2) === ((3L, 1L, 0L, "short doc")))
    assert(out(3) === ((4L, 2L, 2L, "")))
  }

  test("asOf tolerance: over-age matches nulled, boundary gap kept") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:50:00"), 1.0), // exactly 600s back — kept
      (2L, ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("k", "ts", "v")
    val kept = graft.operators.AsOfJoin.asOf(left, right, "k", "ts", "ts", "v",
      Seq("v"), toleranceSeconds = Some(600L)).collect().head
    assert(!kept.isNullAt(kept.fieldIndex("asof_v")))
    val farRight = Seq((1L, ts("2024-01-01 09:49:59"), 1.0)).toDF("k", "ts", "v")
    val nulled = graft.operators.AsOfJoin.asOf(left, farRight, "k", "ts", "ts", "v",
      Seq("v"), toleranceSeconds = Some(600L)).collect().head
    assert(nulled.isNullAt(nulled.fieldIndex("asof_v")))
    // same rows without tolerance: the match survives
    val noTol = graft.operators.AsOfJoin.asOf(left, farRight, "k", "ts", "ts", "v",
      Seq("v")).collect().head
    assert(!noTol.isNullAt(noTol.fieldIndex("asof_v")))
  }

  test("asOf forward: earliest at-or-after match, tolerance bounds ahead") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:59:00"), 0.5), // in the past — not forward-eligible
      (1L, ts("2024-01-01 10:00:00"), 1.0), // equal ts — inclusive match
      (1L, ts("2024-01-01 10:05:00"), 2.0)
    ).toDF("k", "ts", "v")
    val got = graft.operators.AsOfJoin.asOf(left, right, "k", "ts", "ts", "v",
      Seq("v"), direction = "forward").collect().head
    assert(got.getDouble(got.fieldIndex("asof_v")) === 1.0)
    // without the equal-ts row, the next later row matches
    val later = graft.operators.AsOfJoin.asOf(left,
      right.filter(col("v") =!= 1.0), "k", "ts", "ts", "v",
      Seq("v"), direction = "forward").collect().head
    assert(later.getDouble(later.fieldIndex("asof_v")) === 2.0)
    // tolerance: 2 minutes ahead excludes the 10:05 match
    val tol = graft.operators.AsOfJoin.asOf(left,
      right.filter(col("v") =!= 1.0), "k", "ts", "ts", "v",
      Seq("v"), toleranceSeconds = Some(120L), direction = "forward").collect().head
    assert(tol.isNullAt(tol.fieldIndex("asof_v")))
  }

  test("session_window boundary: exactly-the-gap merges, one second past splits") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L), // exactly 30 min later — merges
      (1L, ts("2024-01-01 11:00:01"), 3L)  // 30 min + 1 s — new session
    ).toDF("user_id", "ts", "event_id")
    val sw = rows.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n")).select(col("n")).as[Long].collect().sorted
    assert(sw === Seq(1L, 2L))
    // the lag-based sessionizer shares the inclusive-gap boundary
    val nSessions = graft.operators.Sessionize.sessionCounts(
      rows, "user_id", col("ts"), col("event_id"), 1800L)
      .select(max(col("n_sessions"))).as[Long].collect().head
    assert(nSessions === 2L)
  }

  test("funnelWithin: strictly-after inside the window converts; outside does not") {
    val rows = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),     // converts: purchase next day
      (1L, "purchase", ts("2024-01-02 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),     // too late: 3 days after
      (2L, "purchase", ts("2024-01-04 10:00:01")),
      (3L, "view", ts("2024-01-01 10:00:00")),     // purchase BEFORE the view
      (3L, "purchase", ts("2024-01-01 09:00:00")),
      (4L, "view", ts("2024-01-01 10:00:00"))      // never purchases
    ).toDF("user_id", "event_type", "ts")
    val out = graft.analysis.Engagement.funnelWithin(rows, col("user_id"),
      col("event_type"), col("ts"), "view", "purchase", 2).collect().head
    assert(out.getLong(0) === 4L && out.getLong(1) === 1L)
    assert(out.getDouble(2) === 0.25)
  }

  test("pageRank: hand-computed fixpoints, dangling leak, partition independence") {
    // 2-cycle: 0.5/0.5 is stationary under the quantized update
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val pCyc = graft.analysis.Graph.pageRank(cyc, col("s"), col("d"), 5, 0.75)
      .as[(Long, Double)].collect().toMap
    assert(pCyc === Map(1L -> 0.5, 2L -> 0.5))
    // chain 1 -> 2 with 2 dangling: p1 = 0.125 after one step; p2 after
    // two = r6(0.125 + 0.75 * r6(0.125)) = 0.21875; total mass leaks
    val chain = Seq((1L, 2L)).toDF("s", "d")
    val pChain = graft.analysis.Graph.pageRank(chain, col("s"), col("d"), 2, 0.75)
      .as[(Long, Double)].collect().toMap
    assert(pChain === Map(1L -> 0.125, 2L -> 0.21875))
    assert(pChain.values.sum < 1.0)
    // deterministic across partitionings (decimal-summed contributions)
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toDF("s", "d")
    val a = graft.analysis.Graph.pageRank(edges.repartition(1), col("s"), col("d"), 4, 0.75)
      .as[(Long, Double)].collect().toMap
    val b = graft.analysis.Graph.pageRank(edges.repartition(13), col("s"), col("d"), 4, 0.75)
      .as[(Long, Double)].collect().toMap
    assert(a === b)
    // a node every edge points at outranks everyone (sanity)
    val star = (1L to 9L).map(i => (i, 0L)).toDF("s", "d")
    val pStar = graft.analysis.Graph.pageRank(star, col("s"), col("d"), 3, 0.75)
      .as[(Long, Double)].collect().toMap
    assert(pStar(0L) > pStar(1L))
  }

  test("triangleCount: known graphs, duplicate/self/reversed edges collapse") {
    def count(edges: Seq[(Long, Long)]): (Long, Long, Long) =
      graft.analysis.Graph.triangleCount(edges.toDF("s", "d"), col("s"), col("d"))
        .as[(Long, Long, Long)].collect().head
    // K4: 4 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(count(k4) === ((4L, 6L, 4L)))
    // star (no closing edges): 0 triangles
    assert(count((2L to 6L).map(i => (1L, i))) === ((6L, 5L, 0L)))
    // triangle + pendant, with noise: duplicates, reversals, a self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L), (3L, 4L), (1L, 2L))
    assert(count(messy) === ((4L, 4L, 1L)))
    // hub-heavy graph: the low-ID hub is every edge's endpoint — the
    // degree orientation must still count the two planted triangles
    val hub = (2L to 30L).map(i => (1L, i)) ++ Seq((2L, 3L), (4L, 5L))
    assert(count(hub)._3 === 2L)
  }

  test("kAnonymityReport: violating groups and rows-at-risk arithmetic") {
    // groups: (a x6), (b x2), (c x1) with k = 5
    val rows = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("qi")
    val out = graft.analysis.Eval.kAnonymityReport(rows, Seq(col("qi")), 5)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out === ((3L, 2L, 3L, 1L)))
  }

  test("lDiversityReport: a large group with one sensitive value is flagged") {
    // group a: 10 rows, all sensitive=1 (k-anonymous, NOT diverse)
    // group b: 4 rows, sensitive 1..4
    val rows = (Seq.fill(10)(("a", 1)) ++ (1 to 4).map(v => ("b", v)))
      .toDF("qi", "s")
    val out = graft.analysis.Eval.lDiversityReport(rows, Seq(col("qi")), col("s"), 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out === ((2L, 1L, 10L, 1L)))
  }

  test("krippendorffAlpha: hand-computed nominal alpha, perfect agreement, ragged rejected") {
    def votes(rows: (Long, String)*) = rows.toSeq.toDF("u", "l")
    // 4 units x 2 coders: (a,a) (b,b) (a,b) (a,a)
    // O2=2, n=8, marginals a=5 b=3 -> alpha = 1 - 7*2/(1*30) = 0.533333
    val mixed = votes(1L -> "a", 1L -> "a", 2L -> "b", 2L -> "b",
      3L -> "a", 3L -> "b", 4L -> "a", 4L -> "a")
    val r = graft.analysis.Eval.krippendorffAlpha(mixed, col("u"), col("l"))
      .collect().head
    assert(r.getLong(0) === 4 && r.getLong(1) === 2)
    assert(r.getAs[Double]("alpha") === math.floor((1.0 - 14.0 / 30.0) * 1e6 + 0.5) / 1e6)
    // perfect agreement -> exactly 1
    val perfect = votes(1L -> "x", 1L -> "x", 2L -> "y", 2L -> "y")
    assert(graft.analysis.Eval.krippendorffAlpha(perfect, col("u"), col("l"))
      .collect().head.getAs[Double]("alpha") === 1.0)
    // single-label corpus: expected disagreement 0 -> NULL, not NaN
    val mono = votes(1L -> "x", 1L -> "x", 2L -> "x", 2L -> "x")
    val m = graft.analysis.Eval.krippendorffAlpha(mono, col("u"), col("l"))
      .collect().head
    assert(m.isNullAt(m.fieldIndex("alpha")))
    // ragged coder counts fail LOUDLY (the exact form needs a common m)
    val ragged = votes(1L -> "a", 1L -> "a", 1L -> "a", 2L -> "a", 2L -> "b")
    intercept[Exception] {
      graft.analysis.Eval.krippendorffAlpha(ragged, col("u"), col("l")).collect()
    }
  }

  test("tClosenessReport: global-matching group scores 0, concentrated group is flagged") {
    // values 1..4 appear once per group in "mix" (matches global shape
    // poorly since "low" skews it) — construct exactly: global = mix ∪ low
    // mix: one of each 1,2,3,4; low: four rows all at value 1
    val rows = ((1 to 4).map(v => ("mix", v.toDouble)) ++
      Seq.fill(4)(("low", 1.0))).toDF("g", "v").repartition(3)
    val out = graft.analysis.Eval.tClosenessReport(rows, col("g"), col("v"), 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    // global cum over m=4 values: (5/8, 6/8, 7/8, 8/8)
    // low cum: (1, 1, 1, 1) -> EMD = (3/8 + 2/8 + 1/8 + 0)/3 = 0.25
    assert(out("low").getAs[Double]("t_emd") === 0.25)
    assert(out("low").getAs[Boolean]("violating"))
    // mix cum: (1/4, 2/4, 3/4, 1) -> EMD = (3/8-... ) symmetric: also
    // |1/4-5/8|+|2/4-6/8|+|3/4-7/8| = 3/8+2/8+1/8 over 3 = 0.25
    assert(out("mix").getAs[Double]("t_emd") === 0.25)
    // a group whose distribution IS the global one scores exactly 0
    val same = ((1 to 4).map(v => ("a", v.toDouble)) ++
      (1 to 4).map(v => ("b", v.toDouble))).toDF("g", "v")
    val out2 = graft.analysis.Eval.tClosenessReport(same, col("g"), col("v"), 0.2)
      .collect()
    assert(out2.forall(r => r.getAs[Double]("t_emd") === 0.0))
    assert(out2.forall(r => !r.getAs[Boolean]("violating")))
  }

  test("winsorizeStats: clamp counts and mean shift on a planted outlier") {
    // nine 10.0s and one 1000.0 outlier: p95 (interpolated) < 1000, so
    // exactly one row clamps high and the winsorized mean drops
    val rows = (Seq.fill(9)(10.0) :+ 1000.0).map(("g", _)).toDF("grp", "v")
    val out = graft.analysis.Eval.winsorizeStats(rows, col("grp"), col("v"), 0.05, 0.95)
      .collect().head
    assert(out.getLong(1) === 10L)
    assert(out.getLong(3) === 1L) // one high clamp
    assert(out.getDouble(4) === 109.0) // raw mean
    assert(out.getDouble(5) < 109.0 && out.getDouble(5) >= 10.0)
  }

  test("asOf nearest: closer side wins, exact tie prefers backward") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L")).toDF("k", "ts", "tag")
    def pick(right: Seq[(Long, java.sql.Timestamp, Double)]): Any = {
      val r = graft.operators.AsOfJoin.asOf(left, right.toDF("k", "ts", "v"),
        "k", "ts", "ts", "v", Seq("v"), direction = "nearest").collect().head
      if (r.isNullAt(r.fieldIndex("asof_v"))) null else r.getDouble(r.fieldIndex("asof_v"))
    }
    // forward closer (1 min ahead vs 5 min back)
    assert(pick(Seq((1L, ts("2024-01-01 09:55:00"), 1.0),
      (1L, ts("2024-01-01 10:01:00"), 2.0))) === 2.0)
    // backward closer
    assert(pick(Seq((1L, ts("2024-01-01 09:59:00"), 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2.0))) === 1.0)
    // exact tie (3 min each way) -> backward
    assert(pick(Seq((1L, ts("2024-01-01 09:57:00"), 1.0),
      (1L, ts("2024-01-01 10:03:00"), 2.0))) === 1.0)
    // only one side exists -> that side
    assert(pick(Seq((1L, ts("2024-01-01 11:00:00"), 9.0))) === 9.0)
  }

  test("degreeAssortativity: star is perfectly disassortative, cycle is NULL") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val rs = graft.analysis.Graph.degreeAssortativity(star, col("s"), col("d"))
      .collect().head
    assert(rs.getAs[Long]("n_nodes") === 4 && rs.getAs[Long]("n_edges") === 3)
    assert(rs.getAs[Double]("assortativity") === -1.0)
    // every node degree 2: zero variance -> NULL, not NaN
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val rc = graft.analysis.Graph.degreeAssortativity(cycle, col("s"), col("d"))
      .collect().head
    assert(rc.isNullAt(rc.fieldIndex("assortativity")))
  }

  test("clusteringCoefficient: K4 fully cohesive, pendant undefined") {
    // triangle 1-2-3 plus pendant 4 on node 3
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val out = graft.analysis.Graph.clusteringCoefficient(g, col("s"), col("d"))
      .orderBy("node").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out(0).getDouble(3) === 1.0) // deg 2, 1 triangle
    assert(out(1).getDouble(3) === 1.0)
    assert(out(2).getLong(1) === 3L && out(2).getLong(2) === 1L)
    assert(out(2).getDouble(3) === 0.333333) // 2*1/(3*2), r6
    assert(out(3).isNullAt(3)) // degree-1 node: undefined
    // K4: every node coeff 1.0
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toDF("s", "d")
    val ck4 = graft.analysis.Graph.clusteringCoefficient(k4, col("s"), col("d"))
      .select("coeff").as[Double].collect().toSeq
    assert(ck4 === Seq.fill(4)(1.0))
  }

  test("weightedSample: deterministic, exhaustive at k >= group, ~w selection law") {
    // weight derived from id/4 so BOTH weights appear inside every mod-4
    // stratum (i % 2 would make each stratum weight-homogeneous)
    val rows = (1L to 4000L).map { i =>
      (i, "s" + (i % 4), if ((i / 4) % 2 == 0) 9.0 else 1.0)
    }.toDF("id", "src", "w")
    def sample(df: org.apache.spark.sql.DataFrame, k: Int) =
      graft.curation.Curation.weightedSample(df, col("src"), col("id"), col("w"), k, "ws")
    // partitioning-independent determinism
    val a = sample(rows.repartition(1), 50).as[(String, Int, Long)].collect().toSeq.sorted
    val b = sample(rows.repartition(17), 50).as[(String, Int, Long)].collect().toSeq.sorted
    assert(a === b && a.size === 200)
    // k >= group size -> everything with positive weight appears
    val all = sample(rows, 5000).as[(String, Int, Long)].collect()
    assert(all.length === 4000)
    // zero/negative weights can never be drawn
    val wz = rows.withColumn("w", when(col("id") <= 2000L, 0.0).otherwise(col("w")))
    assert(sample(wz, 5000).as[(String, Int, Long)].collect()
      .forall(_._3 > 2000L))
    // selection frequency tracks weight: among 50x4 picks from a 9:1
    // weighted corpus, heavy items should take a clear supermajority
    // (expected share ~0.9; allow wide noise margin)
    val heavyShare = a.count(t => (t._3 / 4) % 2 == 0).toDouble / a.size
    assert(heavyShare > 0.75 && heavyShare < 1.0, s"heavy share $heavyShare")
  }

  test("fuzzyCurationFunnel: component keeps its best QUALITY-KEPT member") {
    val good = "the quick brown fox jumps over a lazy dog in warm sunshine"
    val docs = Seq(
      (1L, good + " one", "en"),
      (2L, "short text", "en"),          // near-dup of 1/3 but FAILS quality
      (3L, good + " two", "en"),
      (4L, good + " solo", "en")         // singleton
    ).toDF("doc_id", "text", "lang")
    // precondition: the quality rule sees it the way the scenario needs
    val dec = docs.select(col("doc_id"),
      graft.text.TextFeatures.filterDecision(col("text")).as("d")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec(1L) === "kept" && dec(3L) === "kept" && dec(4L) === "kept")
    assert(dec(2L) !== "kept")
    // component {1,2,3} via a hand-made verified-pair table
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val funnel = graft.curation.Curation.fuzzyCurationFunnel(docs, col("doc_id"),
      col("text"), col("lang"), pairs,
      graft.text.TextFeatures.qualityColumns(col("text")).last,
      Map("en" -> 100))
      .orderBy("stage")
      .select("stage_name", "n_docs").as[(String, Long)].collect().toSeq
    // keeper of {1,2,3} = best kept member (1 and 3 tie on qscore -> min
    // id 1); doc 4 survives as its own singleton
    assert(funnel === Seq(("ingested", 4L), ("quality_filter", 3L),
      ("neardup_dedup", 2L), ("mixture", 2L)))
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
