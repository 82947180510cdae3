package graft

import org.apache.spark.sql.functions._

/** Pins the Gram-moments aggregate and the PCA solve: exact quantized
  * moments vs a brute-force reference, merge-order independence, power
  * iteration against closed-form eigenpairs, and zero-shuffle projection.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def vecsDf(vecs: Seq[Array[Float]], parts: Int) =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .repartition(parts)

  private def q6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  test("gramMoments: matches the brute-force quantized sums") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    val rows = graft.analysis.Pca.covariance(vecsDf(vecs, 9), col("vec"), 4)
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val moments = vecsDf(vecs, 9)
      .agg(graft.functions.GramMatrixAgg.gramMoments(col("vec"), 4).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i"), col("e.j"), col("e.n"), col("e.sp"), col("e.si"), col("e.sj"))
      .as[(Int, Int, Long, Long, Long, Long)].collect()
    assert(moments.length === 10)
    moments.foreach { case (i, j, n, sp, si, sj) =>
      assert(n === 50L)
      val expSp = vecs.map(v => q6(v(i).toDouble * v(j).toDouble)).sum
      val expSi = vecs.map(v => q6(v(i).toDouble)).sum
      val expSj = vecs.map(v => q6(v(j).toDouble)).sum
      assert(sp === expSp, s"sp($i,$j)")
      assert(si === expSi && sj === expSj, s"s($i,$j)")
      // covariance row replays the documented formula
      val exp = graft.util.Portable.round6d(
        sp.toDouble / 1e6 / 50.0 -
          (si.toDouble / 1e6 / 50.0) * (sj.toDouble / 1e6 / 50.0))
      assert(rows((i, j)) === exp)
    }
  }

  test("gramMoments: merge-order independent, nulls skipped, ragged vector loud") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(200)(Array.fill(3)(rnd.nextFloat()))
    val a = graft.analysis.Pca.covariance(vecsDf(vecs, 1), col("vec"), 3)
      .as[(Int, Int, Double)].collect().toSeq.sorted
    val b = graft.analysis.Pca.covariance(vecsDf(vecs, 23), col("vec"), 3)
      .as[(Int, Int, Double)].collect().toSeq.sorted
    assert(a === b)
    // null vectors are skipped (n counts only real rows)
    val withNull = vecsDf(vecs.take(10), 3)
      .unionByName(Seq((99L, None: Option[Seq[Float]])).toDF("id", "vec")
        .select(col("id"), col("vec").cast("array<float>").as("vec")))
    val n = withNull.agg(graft.functions.GramMatrixAgg.gramMoments(col("vec"), 3).as("g"))
      .select(element_at(col("g"), 1).getField("n")).as[Long].collect().head
    assert(n === 10L)
    // wrong dimension must fail loudly, not silently diverge
    val ex = intercept[org.apache.spark.SparkException] {
      vecsDf(Seq(Array(1f, 2f)), 1)
        .agg(graft.functions.GramMatrixAgg.gramMoments(col("vec"), 3).as("g"))
        .collect()
    }
    assert(ex.getMessage.contains("length") || ex.getCause != null)
  }

  test("topComponents: closed-form eigenpairs of a known symmetric matrix") {
    // [[2,1],[1,2]]: eigenpairs (3, [1,1]/sqrt2), (1, [1,-1]/sqrt2)
    val cov = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val comps = graft.analysis.Pca.topComponents(cov, 2)
    val (l1, v1) = comps(0)
    val (l2, v2) = comps(1)
    assert(math.abs(l1 - 3.0) < 1e-9)
    assert(math.abs(l2 - 1.0) < 1e-9)
    val s = 1.0 / math.sqrt(2.0)
    assert(v1.zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // sign convention: largest-|coord| positive (here the first coord)
    assert(v2.zip(Array(s, -s)).forall { case (a, b) => math.abs(a - b) < 1e-9 } ||
      v2.zip(Array(-s, s)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // deterministic across calls
    val again = graft.analysis.Pca.topComponents(cov, 2)
    assert(comps.zip(again).forall { case ((la, va), (lb, vb)) =>
      la == lb && va.sameElements(vb) })
  }

  test("pcaRefinedTopK: corpus-wide shortlist = brute force; reduced shortlist keeps recall") {
    // planted low-rank corpus: x = U z + small noise, U 16x4 — PCA's regime
    val rnd = new scala.util.Random(5)
    val d = 16
    val r = 4
    val u = Array.fill(r)(Array.fill(d)(rnd.nextGaussian()))
    val vecs = Seq.fill(200) {
      val z = Array.fill(r)(rnd.nextGaussian() * 3.0)
      Array.tabulate(d) { i =>
        (z.indices.map(s => z(s) * u(s)(i)).sum + rnd.nextGaussian() * 0.05).toFloat
      }
    }
    val df = vecsDf(vecs, 6)
      .select(col("id"), graft.similarity.Knn.toDoubleArray(col("vec")).as("vec"))
    val queries = df.filter(col("id") < 10)
    val cov = graft.analysis.Pca.covMatrix(df, col("vec"), d)
    val comps = graft.analysis.Pca.topComponents(cov, r).map(_._2)
    // exact regime: shortlist covers the corpus -> identical to brute force
    val exact = graft.similarity.Knn.bruteForceTopK(queries, df, 10)
      .select("query_id", "vec_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val refinedAll = graft.analysis.Pca
      .pcaRefinedTopK(queries, df, comps, 10, vecs.size)
      .select("query_id", "vec_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(refinedAll === exact)
    // approximate regime: 40/200 shortlist in 4/16 dims keeps recall high
    val approx = graft.analysis.Pca.pcaRefinedTopK(queries, df, comps, 10, 40)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = approx.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("end-to-end: projection onto the dominant axis separates the planted direction") {
    // points along [3,4]/5 plus small orthogonal noise: PC0 must recover it
    val rnd = new scala.util.Random(3)
    val dir = Array(0.6, 0.8)
    val orth = Array(-0.8, 0.6)
    val vecs = Seq.fill(300) {
      val t = rnd.nextGaussian() * 10.0
      val e = rnd.nextGaussian() * 0.1
      Array((t * dir(0) + e * orth(0)).toFloat, (t * dir(1) + e * orth(1)).toFloat)
    }
    val df = vecsDf(vecs, 8)
    val cov = graft.analysis.Pca.covMatrix(df, col("vec"), 2)
    val comps = graft.analysis.Pca.topComponents(cov, 1)
    val v = comps.head._2
    assert(math.abs(math.abs(v(0) * dir(0) + v(1) * dir(1)) - 1.0) < 1e-3)
    // projection is row-local: no exchange in the plan (project over the
    // un-repartitioned frame — vecsDf's own repartition is an Exchange)
    val proj = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .select(
        (col("id") +: graft.analysis.Pca.projectColumns(col("vec"), comps.map(_._2))): _*)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection should not shuffle:\n$plan")
    // and numerically equals the driver-side dot product
    val got = proj.as[(Long, Double)].collect().toMap
    vecs.zipWithIndex.foreach { case (x, i) =>
      val exp = x(0).toDouble * v(0) + x(1).toDouble * v(1)
      assert(math.abs(got(i.toLong) - exp) < 1e-9)
    }
  }
}
