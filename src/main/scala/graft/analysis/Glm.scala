package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Generalized linear models over groups — the reference's actual
  * regression stack, Spark-first.
  *
  * Reference semantics: the analysis pipeline's regression step is a
  * binomial GLM with a logit link, fit per RQA theme over categorical
  * demographic predictors (reference: src/engagement_db_to_analysis/
  * regression_analysis/complete_case_regression_analysis.py:10
  * `GLM_FAMILY = 'binomial(link="logit")'`, :60 `predictors = ["gender",
  * "age_category", "disability", "recently_displaced"]`, fit with
  * arm::bayesglm), plus a multiple-imputation variant that pools m=20
  * imputed fits (multiple_imputation_regression_analysis.py:61,74).
  *
  * Spark-first realization: IRLS with a FIXED iteration count. Each
  * iteration is ONE map-side-combinable aggregation pass over the rows
  * (Gram matrix X'WX and gradient vector X'(Wη + (y−μ)) per group — the
  * standard IRLS normal equations with the working response multiplied
  * through, so no per-row division can blow up), followed by a per-group
  * p×p solve expressed as unrolled Gaussian-elimination PROJECTIONS over
  * the one-row-per-group aggregate — fully declarative, no driver-side
  * state, embarrassingly parallel in the group dimension. A small ridge on
  * the diagonal stands in for bayesglm's weakly-informative prior and
  * keeps degenerate designs (empty one-hot cells, collinearity) finite.
  *
  * Cross-engine determinism (the oracle gate runs the SAME computation in
  * DuckDB): every arithmetic fragment here is emitted ONCE as a SQL string
  * and rendered into both the Spark plan (via expr) and the oracle query
  * (via generated CTEs), so the two engines execute the identical
  * expression tree. Three guards make that bit-stable:
  *   - moment sums quantize each per-row term to a 1e-12 grid and
  *     accumulate as exact DECIMAL(38,0) — order-independent, so Spark's
  *     nondeterministic partition order cannot perturb the total;
  *   - μ = sigmoid(η) is rounded to 9 decimals immediately (EXP is the one
  *     non-IEEE-mandated function in the pipeline; engines may differ by an
  *     ulp, and the early round quenches it before it can propagate);
  *   - coefficients are rounded to 6 decimals (Portable.round6 arithmetic)
  *     at the END OF EVERY ITERATION, so iteration k+1 starts from
  *     bit-identical inputs on both engines.
  * Everything else is +,-,*,/ and SQRT — IEEE-754 correctly-rounded and
  * therefore engine-independent.
  *
  * Contract: predictors must be bounded (one-hot dummies / small numerics,
  * |x| ≤ ~100) so the quantized terms stay within the 2^53 exact-integer
  * range of FLOOR; that is exactly the reference's predictor shape.
  */
object Glm {

  // ---- shared scalar fragments (valid in Spark SQL AND DuckDB) ----

  /** Portable 6-decimal half-up rounding — string twin of
    * [[graft.util.Portable.round6]]. */
  private def r6s(e: String) = s"FLOOR(($e) * 1.0e6 + 0.5) / 1.0e6"

  /** 9-decimal portable rounding, used to quench EXP ulp drift in μ. */
  private def r9s(e: String) = s"FLOOR(($e) * 1.0e9 + 0.5) / 1.0e9"

  /** Order-independent sum of a bounded double term: quantize to a 1e-12
    * grid (exact integers < 2^53 for |term| ≤ ~9000), accumulate as exact
    * DECIMAL(38,0), convert once. */
  private def qsum(term: String) =
    s"CAST(SUM(CAST(FLOOR(($term) * 1.0e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1.0e12"

  // ---- the shared step program (rendered to DataFrame ops AND to CTEs) ----

  private sealed trait Step
  /** SELECT *, expr AS alias */
  private final case class Extend(alias: String, sqlExpr: String) extends Step
  /** SELECT (alias, expr)* */
  private final case class Project(cols: Seq[(String, String)]) extends Step
  /** SELECT group, (alias, aggExpr)* GROUP BY group */
  private final case class Aggregate(aggs: Seq[(String, String)]) extends Step

  private def runSteps(df0: DataFrame, group: String, steps: Seq[Step]): DataFrame =
    steps.foldLeft(df0) {
      case (df, Extend(a, e))  => df.withColumn(a, expr(e))
      case (df, Project(cols)) => df.select(cols.map { case (a, e) => expr(e).as(a) }: _*)
      case (df, Aggregate(aggs)) =>
        val cols = aggs.map { case (a, e) => expr(e).as(a) }
        df.groupBy(col(group)).agg(cols.head, cols.tail: _*)
    }

  /** Renders the same steps as a chain of CTEs; returns (cteClauses, lastName). */
  private def renderSql(base: String, prefix: String, group: String,
                        steps: Seq[Step]): (Seq[String], String) = {
    var prev = base
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      val name = s"${prefix}_$i"
      val body = step match {
        case Extend(a, e)  => s"SELECT *, $e AS $a FROM $prev"
        case Project(cols) => s"SELECT ${cols.map { case (a, e) => s"$e AS $a" }.mkString(", ")} FROM $prev"
        case Aggregate(aggs) =>
          s"SELECT $group, ${aggs.map { case (a, e) => s"$e AS $a" }.mkString(", ")} FROM $prev GROUP BY $group"
      }
      prev = name
      s"$name AS ($body)"
    }
    (ctes, prev)
  }

  // ---- p×p symmetric solve as unrolled projections ----

  private def aN(i: Int, j: Int) = if (i <= j) s"__a_${i}_$j" else s"__a_${j}_$i"
  private def entries(p: Int): Seq[(Int, Int)] =
    for { i <- 0 until p; j <- i until p } yield (i, j)

  /** (p-1) Gaussian-elimination stages then p back-substitution stages, one
    * beta per stage so every expression only references columns already
    * materialized by the previous stage — the same constraint SQL SELECTs
    * have, which is what keeps the Spark and DuckDB trees identical. No
    * pivoting: the ridged Gram matrix is positive definite. */
  private def solveStages(p: Int, keep: Seq[String]): Seq[Project] = {
    val elim = (0 until p - 1).map { k =>
      val pass = keep.map(c => (c, c)) ++
        entries(p).collect { case (i, j) if i <= k => (aN(i, j), aN(i, j)) } ++
        (0 to k).map(i => (s"__r_$i", s"__r_$i"))
      val upd = entries(p).collect { case (i, j) if i > k =>
        (aN(i, j), s"(${aN(i, j)} - ((${aN(k, i)} * ${aN(k, j)}) / ${aN(k, k)}))")
      } ++ (k + 1 until p).map { i =>
        (s"__r_$i", s"(__r_$i - ((${aN(k, i)} * __r_$k) / ${aN(k, k)}))")
      }
      Project(pass ++ upd)
    }
    val back = (p - 1 to 0 by -1).map { i =>
      val carried = keep.map(c => (c, c)) ++
        entries(p).map { case (a, b) => (aN(a, b), aN(a, b)) } ++
        (0 until p).map(j => (s"__r_$j", s"__r_$j")) ++
        (i + 1 until p).map(j => (s"__b_$j", s"__b_$j"))
      val num =
        if (i == p - 1) s"__r_$i"
        else {
          val tail = (i + 1 until p).map(j => s"(${aN(i, j)} * __b_$j)")
            .reduce((x, y) => s"($x + $y)")
          s"(__r_$i - $tail)"
        }
      Project(carried :+ (s"__b_$i", s"($num / ${aN(i, i)})"))
    }
    elim ++ back
  }

  private def ridgeStep(p: Int, ridge: Double, keep: Seq[String]): Project =
    Project(keep.map(c => (c, c)) ++ entries(p).map { case (i, j) =>
      if (i == j) (aN(i, j), s"(${aN(i, j)} + $ridge)") else (aN(i, j), aN(i, j))
    } ++ (0 until p).map(i => (s"__r_$i", s"__r_$i")))

  /** One IRLS iteration over a frame carrying group, __x0..__x{p-1}, __y
    * and the previous betas __b_0..__b_{p-1}. */
  private def irlsIterationSteps(p: Int, group: String, ridge: Double): Seq[Step] = {
    val keep = Seq(group, "__n")
    val eta = (0 until p).map(i => s"(__b_$i * __x$i)").reduce((a, b) => s"($a + $b)")
    Seq(
      Extend("__eta", eta),
      Extend("__mu", r9s("1.0 / (1.0 + EXP(-(__eta)))")),
      Extend("__w", "(__mu * (1.0 - __mu))"),
      Extend("__u", "((__w * __eta) + (__y - __mu))"),
      Aggregate(("__n", "COUNT(*)") +:
        (entries(p).map { case (i, j) => (aN(i, j), qsum(s"((__x$i * __x$j) * __w)")) } ++
          (0 until p).map(i => (s"__r_$i", qsum(s"(__x$i * __u)"))))),
      ridgeStep(p, ridge, keep)) ++
      solveStages(p, keep) :+
      Project(Seq((group, group), ("__n", "__n")) ++
        (0 until p).map(i => (s"__b_$i", r6s(s"__b_$i"))))
  }

  /** Complete-case filter shared by both renderings: drop rows with any
    * null predictor or response (complete_case_regression_analysis.py:1). */
  private def completeCase(p: Int): String =
    ((1 until p).map(i => s"__x$i IS NOT NULL") :+ "__y IS NOT NULL").mkString(" AND ")

  // ---- public API: logistic GLM ----

  /** Per-group binomial-logit GLM via fixed-iteration IRLS. `rows0` must
    * carry the group column plus the xs/y columns; the intercept is added
    * internally. Output: group, n, b_intercept-first coefficient columns
    * named `outNames` (rounded to 6 decimals).
    *
    * One aggregation pass per iteration; the corpus is scanned `iters`
    * times (cache `rows0` upstream when it is expensive to recompute).
    * Betas travel as a broadcast one-row-per-group frame — no driver-side
    * state, no collect.
    */
  def logitByGroup(rows0: DataFrame, group: String, xs: Seq[Column], y: Column,
                   outNames: Seq[String], iters: Int = 6, ridge: Double = 1e-6): DataFrame = {
    val p = xs.size + 1
    require(outNames.size == p, s"outNames must have ${p} entries (intercept first)")
    require(iters >= 1, "need at least one IRLS iteration")
    val prepared = rows0.select(
      col(group) +: lit(1.0).as("__x0") +:
        xs.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__x${i + 1}") } :+
        y.cast("double").as("__y"): _*)
      .filter(expr(completeCase(p)))
    var beta = prepared.select(col(group)).distinct()
      .select(col(group) +: (0 until p).map(i => lit(0.0).as(s"__b_$i")): _*)
    for (_ <- 1 to iters) {
      val joined = prepared.join(
        broadcast(beta.select(col(group) +: (0 until p).map(i => col(s"__b_$i")): _*)),
        Seq(group))
      beta = runSteps(joined, group, irlsIterationSteps(p, group, ridge))
    }
    beta.select(col(group) +: col("__n").as("n") +:
      (0 until p).map(i => col(s"__b_$i").as(outNames(i))): _*)
  }

  /** DuckDB twin of [[logitByGroup]] — the SAME iteration fragments
    * rendered as CTEs. `rowsSql` must produce the group column plus
    * __x1..__x{p-1} and __y (the intercept __x0 is added here). */
  def logitOracleSql(rowsSql: String, group: String, p: Int, outNames: Seq[String],
                     iters: Int = 6, ridge: Double = 1e-6): String = {
    require(outNames.size == p)
    val b = new StringBuilder("WITH __rows0 AS (\n").append(rowsSql).append("),\n")
    b.append(s"__rows AS (SELECT *, 1.0 AS __x0 FROM __rows0 WHERE ${completeCase(p)}),\n")
    b.append(s"__beta_0 AS (SELECT DISTINCT $group, " +
      (0 until p).map(i => s"0.0 AS __b_$i").mkString(", ") + " FROM __rows),\n")
    var prevBeta = "__beta_0"
    (1 to iters).foreach { k =>
      val join = s"__j_$k AS (SELECT r.*, " +
        (0 until p).map(i => s"b.__b_$i").mkString(", ") +
        s" FROM __rows r JOIN $prevBeta b USING ($group))"
      val (ctes, last) = renderSql(s"__j_$k", s"__it${k}", group,
        irlsIterationSteps(p, group, ridge))
      b.append((join +: ctes).mkString(",\n")).append(",\n")
      prevBeta = last
    }
    // drop the trailing comma+newline, close the WITH, emit the final select
    b.setLength(b.length - 2)
    b.append(s"\nSELECT $group, __n AS n, " +
      (0 until p).map(i => s"__b_$i AS ${outNames(i)}").mkString(", ") +
      s"\nFROM $prevBeta")
    b.toString
  }

  // ---- public API: multivariate OLS via one Gram aggregation ----

  /** One-pass p-variate OLS per group (X'X / X'y moments as exact DECIMAL
    * sums, then the same unrolled solve). Subsumes Regression.ols2ByGroup
    * and is the inner step of the IRLS above with w ≡ 1. Inputs must have
    * ≤ 2 decimal places (cast DECIMAL(18,2), the repo-wide moment
    * convention). The ridge keeps empty one-hot cells and collinear
    * designs finite instead of NULL — documented bayesglm-prior analogue.
    */
  def olsMultiByGroup(rows0: DataFrame, group: String, xs: Seq[Column], y: Column,
                      outNames: Seq[String], ridge: Double = 1e-6): DataFrame = {
    val p = xs.size + 1
    require(outNames.size == p, s"outNames must have ${p} entries (intercept first)")
    val prepared = rows0.select(
      col(group) +: lit(1.0).as("__x0") +:
        xs.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__x${i + 1}") } :+
        y.cast("double").as("__y"): _*)
      .filter(expr(completeCase(p)))
    runSteps(prepared, group, olsMultiSteps(p, group, ridge))
      .select(col(group) +: col("__n").as("n") +:
        (0 until p).map(i => col(s"__b_$i").as(outNames(i))): _*)
  }

  private def olsMultiSteps(p: Int, group: String, ridge: Double): Seq[Step] = {
    val keep = Seq(group, "__n")
    def d(e: String) = s"CAST($e AS DECIMAL(18,2))"
    Seq(
      Aggregate(("__n", "COUNT(*)") +:
        (entries(p).map { case (i, j) =>
          (aN(i, j), s"CAST(SUM(${d(s"__x$i")} * ${d(s"__x$j")}) AS DOUBLE)")
        } ++ (0 until p).map(i =>
          (s"__r_$i", s"CAST(SUM(${d(s"__x$i")} * ${d("__y")}) AS DOUBLE)")))),
      ridgeStep(p, ridge, keep)) ++
      solveStages(p, keep) :+
      Project(Seq((group, group), ("__n", "__n")) ++
        (0 until p).map(i => (s"__b_$i", r6s(s"__b_$i"))))
  }

  /** DuckDB twin of [[olsMultiByGroup]]. */
  def olsMultiOracleSql(rowsSql: String, group: String, p: Int, outNames: Seq[String],
                        ridge: Double = 1e-6): String = {
    require(outNames.size == p)
    val (ctes, last) = renderSql("__rows", "__ols", group, olsMultiSteps(p, group, ridge))
    (s"WITH __rows0 AS (\n$rowsSql),\n" +
      s"__rows AS (SELECT *, 1.0 AS __x0 FROM __rows0 WHERE ${completeCase(p)}),\n" +
      ctes.mkString(",\n") +
      s"\nSELECT $group, __n AS n, " +
      (0 until p).map(i => s"__b_$i AS ${outNames(i)}").mkString(", ") +
      s"\nFROM $last")
  }

  // ---- public API: multiple-imputation pooled regression ----

  /** Portable uniform draw in (0,1) from the md5 digest window at `offset`
    * — Spark dialect (string twin of Curation.hashPct). */
  def sparkPctSql(idExpr: String, offset: Int): String =
    s"(CAST(CONV(SUBSTRING(MD5(CAST($idExpr AS STRING)), ${1 + 4 * (offset - 1)}, 4), 16, 10) AS BIGINT) % 100)"

  /** DuckDB dialect of the same digest-window draw. */
  def duckPctSql(idExpr: String, offset: Int): String =
    s"(('0x' || substr(md5(CAST($idExpr AS VARCHAR)), ${1 + 4 * (offset - 1)}, 4))::BIGINT % 100)"

  /** Imputed-x fragment for one draw: group mean + a mean-zero,
    * unit-variance uniform perturbation scaled by the observed sd —
    * quantized to the 6-decimal grid so the DECIMAL(18,6) cast is
    * unambiguous on both engines. `pct` is the dialect-specific digest
    * expression (0..99). */
  private def xqS(pct: String, spread: Double): String = {
    val u = s"((CAST($pct AS DOUBLE) + 0.5) / 100.0)"
    val ximp = s"(__mean + ((__sd * (($u) - 0.5)) * (SQRT(12.0) * $spread)))"
    s"CASE WHEN __xd IS NULL THEN CAST(${r6s(ximp)} AS DECIMAL(18,6)) " +
      s"ELSE CAST(__xd AS DECIMAL(18,6)) END"
  }

  private val meanS = "(__ssx / (CASE WHEN __n_obs > 0 THEN CAST(__n_obs AS DOUBLE) END))"
  private val sdS =
    "SQRT(GREATEST((__ssxx - ((__ssx * __ssx) / CAST(__n_obs AS DOUBLE))) / " +
      "(CASE WHEN __n_obs > 1 THEN CAST(__n_obs - 1 AS DOUBLE) END), 0.0))"

  /** Pooling tail: per-draw simple-OLS fit + Rubin's rules, as Extend
    * steps over the one-row-per-group aggregate. */
  private def miTailSteps(draws: Int, group: String): Seq[Step] = {
    val m = s"$draws.0"
    val perDraw = (0 until draws).flatMap { d =>
      val den = s"((__n * __sxx_$d) - (__sx_$d * __sx_$d))"
      val guard = s"ABS($den) > 1.0e-9 * GREATEST(ABS(__n * __sxx_$d), ABS(__sx_$d * __sx_$d))"
      Seq(
        Extend(s"__slope_$d",
          s"CASE WHEN $guard THEN (((__n * __sxy_$d) - (__sx_$d * __sy)) / $den) END"),
        Extend(s"__se2_$d",
          s"CASE WHEN __n > 2 THEN (((__syy - ((__sy * __sy) / __n)) - " +
            s"(__slope_$d * (__sxy_$d - ((__sx_$d * __sy) / __n)))) / (__n - 2)) / " +
            s"(__sxx_$d - ((__sx_$d * __sx_$d) / __n)) END"))
    }
    val qbar = (0 until draws).map(d => s"__slope_$d").reduce((a, b) => s"($a + $b)")
    val wbar = (0 until draws).map(d => s"__se2_$d").reduce((a, b) => s"($a + $b)")
    val bvar =
      if (draws == 1) "0.0"
      else s"(${(0 until draws).map(d => s"((__slope_$d - __qbar) * (__slope_$d - __qbar))")
        .reduce((a, b) => s"($a + $b)")} / ${draws - 1}.0)"
    perDraw ++ Seq(
      Extend("__qbar", s"(($qbar) / $m)"),
      Extend("__wbar", s"(($wbar) / $m)"),
      Extend("__bvar", bvar),
      Extend("__ttot", s"(__wbar + ((1.0 + (1.0 / $m)) * __bvar))"),
      Project(Seq(
        (group, group), ("n", "__n"), ("n_obs", "__n_obs"),
        ("m_draws", s"CAST($draws AS INT)"),
        ("slope_pooled", r6s("__qbar")),
        ("var_within", r6s("__wbar")),
        ("var_between", r6s("__bvar")),
        ("se_total", r6s("SQRT(__ttot)")))))
  }

  private def miAggStep(draws: Int): Aggregate =
    Aggregate(Seq(
      ("__n", "COUNT(*)"), ("__n_obs", "COUNT(__xd)"),
      ("__sy", "CAST(SUM(__yd) AS DOUBLE)"),
      ("__syy", "CAST(SUM(__yd * __yd) AS DOUBLE)")) ++
      (0 until draws).flatMap(d => Seq(
        (s"__sx_$d", s"CAST(SUM(__xq_$d) AS DOUBLE)"),
        (s"__sxx_$d", s"CAST(SUM(__xq_$d * __xq_$d) AS DOUBLE)"),
        (s"__sxy_$d", s"CAST(SUM(__xq_$d * __yd) AS DOUBLE)"))))

  /** Multiple-imputation pooled simple regression of y on x per group —
    * the deterministic Spark analogue of mice(m=20) + pooled bayesglm
    * (multiple_imputation_regression_analysis.py:61,74): m hash-seeded
    * imputation draws (each missing x replaced by group mean + a
    * digest-derived, mean-zero unit-variance uniform perturbation scaled
    * by the observed sd), one OLS fit per draw, Rubin's-rules pooling
    * (q̄ = mean of estimates, W = mean within-imputation variance, B =
    * between-imputation variance, T = W + (1+1/m)·B). Two corpus passes
    * total: one stats pass, then ONE conditional aggregation carrying all
    * m draws — imputation never materializes m datasets.
    *
    * `spread` scales the perturbation (1.0 = match observed sd; 0.0
    * degenerates every draw to mean imputation, which is the
    * regression_ols_imputed semantics — pinned by spec). Draw d uses
    * digest window `firstOffset + d`; keep the windows disjoint from any
    * missingness coin derived from the same id.
    */
  def miPooledByGroup(df: DataFrame, group: String, id: Column, x: Column, y: Column,
                      draws: Int, firstOffset: Int = 2, spread: Double = 1.0): DataFrame = {
    require(draws >= 1 && firstOffset >= 1 && firstOffset + draws - 1 <= 8,
      "draws must fit in the md5 digest windows (8 of 4 hex chars)")
    val rows = df.filter(y.isNotNull).select(col(group), id.as("__id"),
      x.cast(DecimalType(18, 2)).as("__xd"), y.cast(DecimalType(18, 2)).as("__yd"))
    val stats = rows.groupBy(col(group)).agg(
      expr("COUNT(__xd)").as("__n_obs"),
      expr("CAST(SUM(__xd) AS DOUBLE)").as("__ssx"),
      expr("CAST(SUM(__xd * __xd) AS DOUBLE)").as("__ssxx"))
      .withColumn("__mean", expr(meanS))
      .withColumn("__sd", expr(sdS))
    val joined = rows.join(
      broadcast(stats.select(col(group), col("__n_obs"), col("__mean"), col("__sd"))),
      Seq(group))
    val withQ = (0 until draws).foldLeft(joined)((d, i) =>
      d.withColumn(s"__xq_$i", expr(xqS(sparkPctSql("__id", firstOffset + i), spread))))
    runSteps(withQ, group, miAggStep(draws) +: miTailSteps(draws, group))
  }

  /** DuckDB twin of [[miPooledByGroup]]. `rowsSql` must produce the group
    * column plus __id, __xd (DECIMAL(18,2), null = missing) and __yd
    * (DECIMAL(18,2)); the y-null filter is applied here like the library
    * applies it. */
  def miPooledOracleSql(rowsSql: String, group: String, draws: Int,
                        firstOffset: Int = 2, spread: Double = 1.0): String = {
    require(draws >= 1 && firstOffset >= 1 && firstOffset + draws - 1 <= 8)
    val statsSql =
      s"SELECT $group, COUNT(__xd) AS __n_obs, CAST(SUM(__xd) AS DOUBLE) AS __ssx, " +
        s"CAST(SUM(__xd * __xd) AS DOUBLE) AS __ssxx FROM __rows GROUP BY $group"
    val qCols = (0 until draws)
      .map(d => s"${xqS(duckPctSql("__id", firstOffset + d), spread)} AS __xq_$d")
      .mkString(", ")
    val (ctes, last) = renderSql("__q", "__mi", group, miAggStep(draws) +: miTailSteps(draws, group))
    (s"WITH __rows0 AS (\n$rowsSql),\n" +
      "__rows AS (SELECT * FROM __rows0 WHERE __yd IS NOT NULL),\n" +
      s"__stats0 AS ($statsSql),\n" +
      s"__stats AS (SELECT *, $meanS AS __mean FROM __stats0),\n" +
      s"__statsd AS (SELECT *, $sdS AS __sd FROM __stats),\n" +
      s"__joined AS (SELECT r.*, s.__n_obs, s.__mean, s.__sd FROM __rows r " +
      s"JOIN __statsd s USING ($group)),\n" +
      s"__q AS (SELECT *, $qCols FROM __joined),\n" +
      ctes.mkString(",\n") +
      s"\nSELECT * FROM $last")
  }
}
