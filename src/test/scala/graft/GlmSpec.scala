package graft

import org.apache.spark.sql.functions._

import graft.analysis.{Glm, Regression}

/** Pins the GLM family — fixed-iteration IRLS logit, Gram-aggregation
  * multivariate OLS, and Rubin's-rules MI pooling — against closed forms
  * and an independent full-precision driver-side fit.
  */
class GlmSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference: plain IRLS in full double precision, no
  // quantization, driver-side — a second implementation to check the
  // distributed one against (not a copy of its expression tree)
  private def refLogit(rows: Seq[(Array[Double], Double)], p: Int,
                       iters: Int = 50, ridge: Double = 1e-6): Array[Double] = {
    val beta = Array.fill(p)(0.0)
    for (_ <- 1 to iters) {
      val a = Array.ofDim[Double](p, p)
      val r = Array.fill(p)(0.0)
      rows.foreach { case (x, y) =>
        val eta = (0 until p).map(i => beta(i) * x(i)).sum
        val mu = 1.0 / (1.0 + math.exp(-eta))
        val w = mu * (1.0 - mu)
        for (i <- 0 until p; j <- 0 until p) a(i)(j) += x(i) * x(j) * w
        for (i <- 0 until p) r(i) += x(i) * (w * eta + (y - mu))
      }
      for (i <- 0 until p) a(i)(i) += ridge
      // gaussian elimination (no pivoting; SPD)
      for (k <- 0 until p - 1; i <- k + 1 until p) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until p) a(i)(j) -= f * a(k)(j)
        r(i) -= f * r(k)
      }
      for (i <- p - 1 to 0 by -1) {
        var s = r(i)
        for (j <- i + 1 until p) s -= a(i)(j) * beta(j)
        beta(i) = s / a(i)(i)
      }
    }
    beta
  }

  test("logitByGroup hits the closed-form MLE on a saturated binary design") {
    // x=0: 30/100 positive → b0 = ln(30/70); x=1: 60/100 → b1 = ln(60/40) − b0.
    // Fixed-K IRLS with per-iteration 6dp rounding lands exactly on the
    // 6dp-rounded MLE by iteration 2 (simulated and pinned).
    val rows =
      Seq.fill(30)((0.0, 1.0)) ++ Seq.fill(70)((0.0, 0.0)) ++
        Seq.fill(60)((1.0, 1.0)) ++ Seq.fill(40)((1.0, 0.0))
    val df = rows.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val got = Glm.logitByGroup(df, "g", Seq(col("x")), col("y"), Seq("b0", "b1"))
      .select("b0", "b1").as[(Double, Double)].collect().head
    assert(got._1 == math.floor(math.log(30.0 / 70.0) * 1e6 + 0.5) / 1e6) // -0.847298
    assert(got._2 == 1.252763)
  }

  test("logitByGroup agrees with an independent full-precision IRLS fit") {
    // deterministic pseudo-random 3-predictor design with a known-ish signal
    val data = (0 until 400).map { i =>
      val x1 = (i % 2).toDouble
      val x2 = if ((i / 2) % 3 == 1) 1.0 else 0.0
      val x3 = ((i / 6) % 5).toDouble
      // deterministic outcome: threshold a hash-ish mix so y isn't separable
      val score = 0.8 * x1 - 0.5 * x2 + 0.15 * x3 - 0.4
      val noise = ((i * 2654435761L) % 1000) / 1000.0 // uniform-ish in [0,1)
      val y = if (noise < 1.0 / (1.0 + math.exp(-score))) 1.0 else 0.0
      (x1, x2, x3, y)
    }
    val df = data.map { case (a, b, c, y) => ("g", a, b, c, y) }.toDF("g", "x1", "x2", "x3", "y")
    val got = Glm.logitByGroup(df, "g", Seq(col("x1"), col("x2"), col("x3")), col("y"),
      Seq("b0", "b1", "b2", "b3"), iters = 8)
      .select("b0", "b1", "b2", "b3").as[(Double, Double, Double, Double)].collect().head
    val ref = refLogit(data.map { case (a, b, c, y) => (Array(1.0, a, b, c), y) }, 4)
    val gotArr = Seq(got._1, got._2, got._3, got._4)
    gotArr.zip(ref).foreach { case (g, r) =>
      assert(math.abs(g - r) < 1e-4, s"IRLS $gotArr vs reference ${ref.toSeq}")
    }
  }

  test("logitByGroup drops incomplete rows and fits groups independently") {
    val df = Seq(
      ("a", Some(1.0), Some(1.0)), ("a", Some(0.0), Some(0.0)),
      ("a", None, Some(1.0)), ("a", Some(1.0), None), // complete-case drops
      ("b", Some(0.0), Some(1.0)), ("b", Some(1.0), Some(0.0))
    ).toDF("g", "x", "y")
    val got = Glm.logitByGroup(df, "g", Seq(col("x")), col("y"), Seq("b0", "b1"))
      .select("g", "n").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L))
  }

  test("huberByGroup shrugs off the outlier that drags OLS") {
    // clean line y = 10 + 2x on x = 0..19, plus one monster outlier at
    // x = 10: OLS chases it, the Huber fit (delta = 5) stays on the line
    val clean = (0 until 20).map(x => ("g", x.toDouble, 10.0 + 2.0 * x))
    val df = (clean :+ (("g", 10.0, 5000.0))).toDF("g", "x", "y")
    val hub = Glm.huberByGroup(df, "g", Seq(col("x")), col("y"),
        Seq("b0", "b1"), delta = 5.0)
      .select("b0", "b1").as[(Double, Double)].collect().head
    assert(math.abs(hub._1 - 10.0) < 0.5 && math.abs(hub._2 - 2.0) < 0.1, hub)
    val ols = Glm.olsMultiByGroup(df, "g", Seq(col("x")), col("y"), Seq("b0", "b1"))
      .select("b0", "b1").as[(Double, Double)].collect().head
    // the outlier moves the OLS intercept by two orders of magnitude more
    assert(math.abs(ols._1 - 10.0) > 10.0, ols)
    // delta must be positive
    intercept[IllegalArgumentException] {
      Glm.huberByGroup(df, "g", Seq(col("x")), col("y"), Seq("b0", "b1"), delta = 0.0)
    }
  }

  test("olsMultiByGroup recovers an exact multivariate line") {
    // y = 3 + 2·x1 − 1·x2 + 0.5·x3 exactly; DECIMAL-exact inputs
    val df = (0 until 60).map { i =>
      val x1 = (i % 2).toDouble; val x2 = ((i / 2) % 3).toDouble; val x3 = ((i / 6) % 10).toDouble
      ("g", x1, x2, x3, 3.0 + 2.0 * x1 - 1.0 * x2 + 0.5 * x3)
    }.toDF("g", "x1", "x2", "x3", "y")
    val got = Glm.olsMultiByGroup(df, "g", Seq(col("x1"), col("x2"), col("x3")), col("y"),
      Seq("b0", "b1", "b2", "b3"))
      .select("b0", "b1", "b2", "b3").as[(Double, Double, Double, Double)].collect().head
    // ridge 1e-6 perturbs the exact solution below the 6dp output grid
    assert(got == ((3.0, 2.0, -1.0, 0.5)))
  }

  test("olsMultiByGroup matches ols2ByGroup on a bivariate design") {
    val df = (0 until 50).map { i =>
      val x1 = (i % 5).toDouble; val x2 = ((i / 5) % 7).toDouble
      ("g", x1, x2, 1.5 + 0.25 * x1 - 0.75 * x2 + (i % 3) * 0.01)
    }.toDF("g", "x1", "x2", "y")
    val multi = Glm.olsMultiByGroup(df, "g", Seq(col("x1"), col("x2")), col("y"),
      Seq("b0", "b1", "b2"))
      .select("b0", "b1", "b2").as[(Double, Double, Double)].collect().head
    val two = Regression.ols2ByGroup(df, Seq(col("g")), col("x1"), col("x2"), col("y"))
      .select("b0", "b1", "b2").as[(Double, Double, Double)].collect().head
    Seq(multi._1 -> two._1, multi._2 -> two._2, multi._3 -> two._3).foreach {
      case (m, t) => assert(math.abs(m - t) < 1e-5, s"$multi vs $two")
    }
  }

  test("olsMultiByGroup stays finite on a collinear design (ridge prior)") {
    // x2 = 2·x1 exactly — OLS normal equations are singular; the bayesglm
    // ridge analogue must still return finite deterministic coefficients
    val df = (0 until 20).map { i =>
      val x1 = (i % 4).toDouble
      ("g", x1, 2.0 * x1, 1.0 + x1)
    }.toDF("g", "x1", "x2", "y")
    val got = Glm.olsMultiByGroup(df, "g", Seq(col("x1"), col("x2")), col("y"),
      Seq("b0", "b1", "b2"))
      .select("b0", "b1", "b2").as[(Double, Double, Double)].collect().head
    Seq(got._1, got._2, got._3).foreach(v => assert(!v.isNaN && !v.isInfinite))
    // the ridge solution spreads the unit slope across the collinear pair:
    // b1 + 2·b2 ≈ 1
    assert(math.abs(got._2 + 2 * got._3 - 1.0) < 1e-3)
  }

  test("miPooledByGroup at m=1, spread=0 degenerates to mean imputation") {
    // spread 0 makes every draw the group mean — regression_ols_imputed's
    // semantics; pooled slope must equal the closed-form imputed OLS slope
    val df = Seq(
      ("g", 1L, Some(1), 3.0), ("g", 2L, Some(2), 5.0), ("g", 3L, Some(3), 7.0),
      ("g", 4L, None, 4.0), ("g", 5L, None, 6.0)
    ).toDF("g", "id", "x", "y")
    val mi = Glm.miPooledByGroup(df, "g", col("id"), col("x"), col("y"),
      draws = 1, firstOffset = 2, spread = 0.0)
      .select("slope_pooled", "var_between").as[(Double, Double)].collect().head
    val imputed = Regression.olsImputedByGroup(df, Seq(col("g")), col("x"), col("y"))
      .select("slope").as[Double].collect().head
    assert(mi._1 == imputed)
    assert(mi._2 == 0.0) // single draw → no between-imputation variance
  }

  test("miPooledByGroup pools by Rubin's rules (T = W + (1+1/m)·B)") {
    val df = (1 to 200).map { i =>
      val x = if (i % 4 == 0) None else Some(i % 13)
      ("g", i.toLong, x, (i % 13) * 0.5 + (i % 7) * 0.1)
    }.toDF("g", "id", "x", "y")
    val got = Glm.miPooledByGroup(df, "g", col("id"), col("x"), col("y"),
      draws = 5, firstOffset = 2)
      .select("m_draws", "var_within", "var_between", "se_total")
      .as[(Int, Double, Double, Double)].collect().head
    assert(got._1 == 5)
    assert(got._2 > 0.0) // within-imputation sampling variance
    assert(got._3 >= 0.0)
    val t = got._2 + (1.0 + 1.0 / 5.0) * got._3
    // W and B are themselves 6dp-rounded before this reconstruction, and
    // d√T/dT = 1/(2√T) ≈ 17 here amplifies that grid error into se_total
    assert(math.abs(got._4 - math.sqrt(t)) < 3e-5, s"$got")
  }

  test("miLogitPooledByGroup with no missing data degenerates to the plain logit fit") {
    // all x observed → every imputation chain sees identical data → the m
    // chains equal the single complete-data IRLS chain and B must be 0
    val rows =
      Seq.fill(30)((0.0, 1.0)) ++ Seq.fill(70)((0.0, 0.0)) ++
        Seq.fill(60)((1.0, 1.0)) ++ Seq.fill(40)((1.0, 0.0))
    val df = rows.zipWithIndex.map { case ((x, y), i) => ("g", i.toLong, x, y) }
      .toDF("g", "id", "x", "y")
    val mi = Glm.miLogitPooledByGroup(df, "g", col("id"), col("x"), col("y"), draws = 3)
      .select("intercept_pooled", "slope_pooled", "var_between")
      .as[(Double, Double, Double)].collect().head
    val single = Glm.logitByGroup(df, "g", Seq(col("x")), col("y"), Seq("b0", "b1"))
      .select("b0", "b1").as[(Double, Double)].collect().head
    // the generic-elimination and closed-form 2×2 solves are algebraically
    // equal; per-iteration 6dp re-rounding keeps them on the same grid
    assert(math.abs(mi._1 - single._1) < 2e-6, s"$mi vs $single")
    assert(math.abs(mi._2 - single._2) < 2e-6, s"$mi vs $single")
    assert(mi._3 == 0.0)
  }

  test("miLogitPooledByGroup pools independent chains over real missingness") {
    val df = (1 to 300).map { i =>
      val x = if (i % 4 == 0) None else Some((i % 13).toDouble)
      val y = if ((i * 2654435761L) % 100 < 30 + 4 * (i % 13)) 1.0 else 0.0
      ("g", i.toLong, x, y)
    }.toDF("g", "id", "x", "y")
    val got = Glm.miLogitPooledByGroup(df, "g", col("id"), col("x"), col("y"), draws = 4)
      .select("n", "n_obs", "m_draws", "slope_pooled", "var_within", "var_between", "se_total")
      .as[(Long, Long, Int, Double, Double, Double, Double)].collect().head
    assert(got._1 == 300 && got._2 == 225 && got._3 == 4)
    assert(got._4 > 0.0) // positive x→y signal by construction
    assert(got._5 > 0.0) // Fisher variance at the converged fit
    assert(got._6 > 0.0) // draws disagree → between-imputation variance
    val t = got._5 + (1.0 + 1.0 / 4.0) * got._6
    assert(math.abs(got._7 - math.sqrt(t)) < 3e-5, s"$got")
  }

  test("miLogitPooledByGroup degrades to NULL outputs for an all-missing group") {
    // group "b" has NO observed x at all: the imputation moments (mean/sd)
    // are undefined, the oracle's SQL chain yields NULL result columns, and
    // the driver-side solve must survive the NULL Gram sums instead of
    // throwing (regression: NullPointerException in iteration 1). Group "a"
    // must be completely unaffected by b's presence.
    val good = (1 to 200).map { i =>
      val x = if (i % 4 == 0) None else Some((i % 13).toDouble)
      val y = if ((i * 2654435761L) % 100 < 30 + 4 * (i % 13)) 1.0 else 0.0
      ("a", i.toLong, x, y)
    }
    val bad = (1 to 50).map(i => ("b", (1000 + i).toLong, Option.empty[Double], (i % 2).toDouble))
    val df = (good ++ bad).toDF("g", "id", "x", "y")
    val rows = Glm.miLogitPooledByGroup(df, "g", col("id"), col("x"), col("y"), draws = 3)
      .collect().map(r => r.getString(r.fieldIndex("g")) -> r).toMap
    assert(rows.keySet == Set("a", "b"))
    val b = rows("b")
    assert(b.getLong(b.fieldIndex("n_obs")) == 0L)
    assert(b.isNullAt(b.fieldIndex("slope_pooled")), "all-missing group must pool to NULL")
    val a = rows("a")
    val slope = a.getDouble(a.fieldIndex("slope_pooled"))
    assert(!slope.isNaN && slope > 0.0, s"group a must still fit: $slope")
    // the healthy group's fit is identical with and without the degenerate
    // group in the frame
    val alone = Glm.miLogitPooledByGroup(good.toDF("g", "id", "x", "y"),
      "g", col("id"), col("x"), col("y"), draws = 3).collect().head
    assert(alone.getDouble(alone.fieldIndex("slope_pooled")) == slope)
  }

  test("miPooledByGroup perturbation draws differ across imputations") {
    // with spread=1 and real missingness, draws disagree → B > 0
    val df = (1 to 100).map { i =>
      val x = if (i % 3 == 0) None else Some(i % 11)
      ("g", i.toLong, x, (i % 11) * 1.0)
    }.toDF("g", "id", "x", "y")
    val got = Glm.miPooledByGroup(df, "g", col("id"), col("x"), col("y"),
      draws = 4, firstOffset = 2)
      .select("var_between").as[Double].collect().head
    assert(got > 0.0)
  }
}
