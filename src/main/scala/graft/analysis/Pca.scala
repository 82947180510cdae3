package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GramMatrixAgg, VectorExpressions}

/** PCA over an embedding column — whitening and dimensionality reduction
  * ahead of ANN indexing / clustering (the classic IVF-PQ preprocessing:
  * rotate to decorrelated axes, keep the high-variance ones).
  *
  * Design mirrors the GLM family's split: the DISTRIBUTED part is one
  * corpus pass through the bounded [[GramMatrixAgg]] buffer (no fan-out,
  * no d²-wide shuffle); the d×d eigensolve is driver-side on a
  * dimension-bounded matrix (d=64 → 4 KB), exactly like the oracle's p×p
  * solve in Glm. Projection is a row-local codegen'd dot product against
  * broadcast literal components — zero shuffle.
  */
object Pca {

  private val r6 = graft.util.Portable.round6 _

  /** The (i, j, n, sp, si, sj) moment rows → covariance frame
    * (i, j, cov), upper triangle. cov follows the exact-quantized-moment
    * formula (`sp/1e6/n − (si/1e6/n)(sj/1e6/n)`, r6-rounded) so any SQL
    * engine replays it bit-for-bit. */
  def covariance(df: DataFrame, vec: Column, d: Int): DataFrame = {
    val m = lit(1000000.0)
    df.agg(GramMatrixAgg.gramMoments(vec, d).as("__g"))
      .select(explode(col("__g")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"),
        r6(col("e.sp").cast("double") / m / col("e.n").cast("double")
          - (col("e.si").cast("double") / m / col("e.n").cast("double"))
          * (col("e.sj").cast("double") / m / col("e.n").cast("double"))).as("cov"))
  }

  /** Driver-side covariance matrix from the same aggregate — the bounded
    * input to the eigensolve. UNROUNDED (full double precision): rounding
    * belongs at oracle-comparison boundaries, not inside the solver. */
  def covMatrix(df: DataFrame, vec: Column, d: Int): Array[Array[Double]] = {
    val rows = df.agg(GramMatrixAgg.gramMoments(vec, d).as("__g"))
      .select(explode(col("__g")).as("e"))
      .select(col("e.i"), col("e.j"), col("e.n"), col("e.sp"), col("e.si"), col("e.sj"))
      .collect() // d(d+1)/2 rows — dimension-bounded, never corpus-bound
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val n = r.getLong(2).toDouble
      val c = r.getLong(3).toDouble / 1e6 / n -
        (r.getLong(4).toDouble / 1e6 / n) * (r.getLong(5).toDouble / 1e6 / n)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    cov
  }

  /** Top-k eigenvectors of a symmetric matrix by deterministic power
    * iteration with deflation. Deterministic start (basis vector at the
    * largest diagonal entry, index ties low) and a fixed iteration count —
    * no RNG, so retrains are bit-reproducible. Sign convention: the
    * largest-|component| coordinate is positive (ties low index).
    * Returns (eigenvalue, eigenvector) pairs, eigenvalue descending. */
  def topComponents(cov: Array[Array[Double]], k: Int, iters: Int = 100): Seq[(Double, Array[Double])] = {
    val d = cov.length
    require(k >= 1 && k <= d, s"need 1 <= k <= d, got k=$k d=$d")
    val a = cov.map(_.clone())
    val out = Seq.newBuilder[(Double, Array[Double])]
    for (_ <- 0 until k) {
      // start at the basis vector with the largest remaining diagonal —
      // deterministic and (for a PSD residual) never orthogonal to the
      // dominant eigenvector unless that diagonal is already ~zero
      var best = 0
      var i = 1
      while (i < d) { if (a(i)(i) > a(best)(best)) best = i; i += 1 }
      var v = Array.tabulate(d)(i => if (i == best) 1.0 else 0.0)
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val w = mult(a, v)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 0) {
          v = w.map(_ / nrm)
          lambda = dot(v, mult(a, v))
        }
      }
      // canonical sign: largest-|coord| positive
      var m = 0
      i = 1
      while (i < d) { if (math.abs(v(i)) > math.abs(v(m))) m = i; i += 1 }
      if (v(m) < 0) v = v.map(-_)
      out += ((lambda, v))
      // deflate: a -= lambda v vᵀ
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) { a(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
    }
    out.result()
  }

  private def mult(a: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = v.length
    Array.tabulate(d) { i =>
      var s = 0.0
      var j = 0
      while (j < d) { s += a(i)(j) * v(j); j += 1 }
      s
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Project the vector column onto the given components — one codegen'd
    * dot product per component against a literal array (broadcast with the
    * plan, zero shuffle). Emits pc0..pc{k-1} double columns. */
  def projectColumns(vec: Column, components: Seq[Array[Double]]): Seq[Column] =
    components.zipWithIndex.map { case (c, i) =>
      VectorExpressions.dot(vec.cast("array<double>"), typedLit(c.toSeq)).as(s"pc$i")
    }

  /** Two-stage ANN with a PCA-reduced shortlist: score every pair in the
    * r-dimensional projected space (r/d of the brute-force arithmetic —
    * at r=8 over d=64, an 8× cheaper scan), then exactly re-rank only the
    * per-query shortlist at full dimension. The PQ `refinedTopK` trade
    * with a rotation instead of a codebook: no training beyond one
    * covariance pass, and the shortlist scan stays a plain dot-product
    * kernel. Shortlist ids broadcast against the corpus scan for the
    * re-rank — the corpus is never shuffled.
    *
    * Inputs follow Knn's (id, vec: array<double>) contract; output is
    * schema-compatible with Knn.bruteForceTopK and provably identical to
    * it when `shortlist` covers the corpus (spec-pinned); recall in the
    * approximate regime is governed by how much variance the components
    * capture (recall-tested on a planted low-rank corpus).
    */
  def pcaRefinedTopK(queries: DataFrame, corpus: DataFrame,
                     components: Seq[Array[Double]], k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    def reduce(df: DataFrame): DataFrame =
      df.select(col("id"), array(projectColumns(col("vec"), components): _*).as("vec"))
    val cand = graft.similarity.Knn
      .bruteForceTopK(reduce(queries), reduce(corpus), shortlist)
      .select(col("query_id"), col("vec_id"))
    val dot = VectorExpressions.dot _
    val withVecs = corpus.select(col("id").as("vec_id"), col("vec").as("cvec"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qvec"))),
        Seq("query_id"))
    val denom = sqrt(dot(col("qvec"), col("qvec"))) * sqrt(dot(col("cvec"), col("cvec")))
    val scored = withVecs.select(col("query_id"), col("vec_id"),
      r6(when(denom =!= 0.0, dot(col("qvec"), col("cvec")) / denom)).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
