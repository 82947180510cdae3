package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force top-k is the exact baseline: broadcast the (small) query set,
  * compute codegen'd dot products against the corpus, and take a windowed
  * top-k per query — at 100 TB the corpus scan is embarrassingly parallel
  * and the only shuffle is the per-query top-k (tiny).
  *
  * The scale path is sign-bucket LSH: deterministic pseudo-random
  * hyperplanes, bucket by sign bits, search only within the query's bucket.
  * Bucketing turns the corpus scan into a hash-partitioned lookup — the
  * standard recall/latency trade.
  */
object Knn {

  // all oracle-compared 6-decimal rounding goes through the portable floor
  // arithmetic (see Portable.round6) — engine round() implementations
  // disagree on half-way quotients, and a cosine landing on one would flip
  // a top-k ordering or bucket assignment against the oracle
  private val r6 = graft.util.Portable.round6 _

  /** Element sum of products over double arrays, folded left-to-right (the
    * same order a sequential engine uses, keeping the oracle comparable).
    * Fused single-loop expression — the HOF formulation
    * (aggregate(zip_with(...))) evaluates interpreted, a boxed closure call
    * per element, and dominated the ANN family's round-1 cost.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** NULL for zero-magnitude vectors (ANSI mode would otherwise throw
    * DIVIDE_BY_ZERO and kill the job on one bad embedding). The oracle SQL
    * twins guard their denominators with NULLIF(..., 0) to land on the
    * same NULL — an IEEE engine would otherwise produce NaN for 0/0,
    * which sorts at the opposite rank extreme.
    */
  def cosine(a: Column, b: Column): Column =
    cosinePrenormed(a, b, sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine with pre-computed per-side norms: at pair time only ONE dot
    * product is evaluated instead of three. Numerically identical to
    * `cosine` (each norm is the same sqrt(dot(v,v)), just computed once per
    * vector instead of once per pair); the zero-denominator guard lives
    * only here so the exact and prenormed paths can never diverge.
    */
  private def cosinePrenormed(a: Column, b: Column, denom: Column): Column =
    when(denom =!= 0.0, dot(a, b) / denom)

  /** Adds the vector's L2 norm once per row, before any pair join. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("__norm", sqrt(dot(col("vec"), col("vec"))))

  /** Shared ranking contract for every top-k variant: round to 6 decimals,
    * order desc with vec_id tiebreak, keep k. One definition so exact and
    * approximate paths can never drift apart.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The one exact scoring pipeline (broadcast queries, prenormed cosine,
    * 6-decimal round): bruteForceTopK and hardNegativeTopK both build on
    * it so the scoring contract cannot drift between the two.
    *
    * Contract: query ids share the corpus id space (queries are drawn from
    * the corpus) — the `q.id =!= c.id` self-match exclusion assumes equal
    * ids mean the same vector. An external query set with coincidentally
    * overlapping ids must be re-keyed first.
    */
  private def scoredPairs(queries: DataFrame, corpus: DataFrame): DataFrame =
    withNorm(corpus).as("c")
      .join(broadcast(withNorm(queries).as("q")), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("vec_id"),
        r6(cosinePrenormed(col("q.vec"), col("c.vec"),
          col("q.__norm") * col("c.__norm"))).as("cos_sim"))

  /** Exact brute-force cosine top-k. `queries`/`corpus` need (id, vec)
    * columns; vec must already be double[]. Rounded to 6 decimals before
    * ranking so float noise can't flip an ordering against the oracle.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    rankTopK(scoredPairs(queries, corpus), k)

  /** Hard-negative mining for embedding-model training: per anchor, the
    * top-k most-similar corpus vectors that are NOT near-duplicates of it
    * (cos >= `dupThreshold` means "same content" — a false negative that
    * would poison the training pairs). The duplicate exclusion happens
    * BEFORE ranking, so all k slots hold usable negatives — a post-filter
    * on plain top-k would return fewer than k whenever duplicates crowd
    * the head.
    *
    * Unlike bruteForceTopK's handful of probe queries, mining anchors are
    * typically corpus-proportional (a % sample), so the anchor × corpus
    * pair volume cannot feed a window sort — at a 100× replica that plan
    * spent 30+ minutes in TimSort. Two passes instead: (1) the bounded-
    * heap TopKDoubles aggregate folds each anchor's k-th-best score in
    * ONE scan (no sort, k doubles per anchor per task); (2) only rows at
    * or above their anchor's cutoff survive (ties included) into the
    * final window, which replays the exact (cos desc, vec_id) ranking
    * over ~k rows per anchor. Both passes regenerate the pairs map-side
    * off the broadcast query join — recomputing a codegen'd dot product
    * is cheap; sorting the pair volume is not. The cutoff frame is
    * anchors-sized and unhinted (AQE broadcasts it from measured size).
    * Output is provably identical to the single-window formulation: rows
    * above the k-th value always rank ≤ k, rows below never do, and
    * value-ties at the cutoff are re-decided by the same tie-break.
    * Swap in the LSH/IVF bucket join for the corpus-scale path.
    */
  def hardNegativeTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                       dupThreshold: Double): DataFrame = {
    val scored = scoredPairs(queries, corpus).filter(col("cos_sim") < dupThreshold)
    val cutoffs = scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos_sim"), k).as("__top"))
      .select(col("query_id"),
        element_at(col("__top"), size(col("__top"))).as("__cut"))
    rankTopK(
      scored.join(cutoffs, Seq("query_id"))
        .filter(col("cos_sim") >= col("__cut"))
        .select(col("query_id"), col("vec_id"), col("cos_sim")),
      k)
  }

  /** Symmetric int8 quantization of an embedding: per-vector scale =
    * max|x|/127, components rounded to bytes. 4x smaller than float32 at
    * rest and on the wire (8x vs the double arrays Spark otherwise
    * exchanges) — the storage/shuffle lever for corpus-scale ANN, with
    * recall loss bounded in KnnSpec. Returns struct(scale, q:array<byte>);
    * `dequantizeInt8` restores doubles for exact re-ranking of a
    * quantized shortlist.
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = greatest(array_max(transform(vec, x => abs(x))), lit(1e-12)) / lit(127.0)
    // bind the scale as a lambda variable (singleton-array transform) so it
    // evaluates ONCE per row — inlining it into the per-element lambda
    // would re-run the max-abs scan for every component: O(d²) per vector
    element_at(transform(array(scale), s =>
      struct(s.as("scale"),
        transform(vec, x => round(x / s).cast("byte")).as("q"))), 1)
  }

  def dequantizeInt8(quantized: Column): Column =
    transform(quantized.getField("q"),
      x => x.cast("double") * quantized.getField("scale"))

  /** Deterministic pseudo-random hyperplanes (fixed seed), as literal arrays
    * broadcast with the plan — no RNG at execution time, so reruns and
    * resumes agree.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextDouble() - 0.5)
  }

  /** Sign-bucket key: one bit per hyperplane. */
  def signBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vec, planeCol) >= 0, "1").otherwise("0")
    }
    concat(bits.toIndexedSeq: _*)
  }

  /** LSH-bucketed approximate top-k: candidates share the query's sign
    * bucket; ranking matches bruteForceTopK within the bucket. Queries with
    * an empty bucket return fewer than k rows (standard ANN recall trade).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val qb = withNorm(queries).withColumn("bucket", signBucket(col("vec"), planes))
    val cb = withNorm(corpus).withColumn("bucket", signBucket(col("vec"), planes))
    bucketJoinTopK(qb, cb, k)
  }

  /** Nearest-centroid assignment (deterministic tie-break on centroid id):
    * shared by IVF search, k-means training, and inertia measurement.
    * Returns (id, vec, cid, __dist); with topN > 1, the N nearest centroids
    * per vector (the multi-probe set).
    *
    * Squared-L2 via the dot-product expansion |v|² - 2v·c + |c|², with the
    * two self-dots PRE-COMPUTED — |v|² once per row (reused across all k
    * centroids) and |c|² once per centroid — so the k-wide scan evaluates
    * one dot per pair instead of three. Same doubles in the same fold
    * order ((x - y) + z), so distances are bit-identical to the inline
    * form and the oracle contract is unchanged.
    */
  private def assignNearest(df: DataFrame, cent: DataFrame, topN: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("__dist").asc, col("cid").asc)
    df.withColumn("__v2", dot(col("vec"), col("vec")))
      .crossJoin(broadcast(cent.withColumn("__c2", dot(col("cvec"), col("cvec")))))
      .withColumn("__dist", r6(
        col("__v2") - lit(2.0) * dot(col("vec"), col("cvec")) + col("__c2")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topN)
      .select(col("id"), col("vec"), col("cid"), col("__dist"))
  }

  /** The one bucket-join + score + rank block every approximate top-k
    * variant shares: corpus rows meet broadcast query rows on an equal
    * bucket key, cosine from pre-computed norms, common rankTopK contract.
    * Both inputs need (id, vec, __norm, bucket).
    */
  private def bucketJoinTopK(queriesB: DataFrame, corpusB: DataFrame, k: Int): DataFrame = {
    val scored = corpusB.as("c")
      .join(broadcast(queriesB.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("vec_id"),
        r6(cosinePrenormed(col("q.vec"), col("c.vec"),
          col("q.__norm") * col("c.__norm"))).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** Multi-probe LSH: each query also probes every bucket at hamming
    * distance 1 from its own (flip one sign bit), trading numPlanes extra
    * lookups for substantially better recall — the standard fix for
    * sign-LSH's hard bucket boundaries. Candidates are ranked identically
    * to the exact path.
    */
  def lshMultiProbeTopK(queries: DataFrame, corpus: DataFrame, k: Int, numPlanes: Int, dim: Int): DataFrame =
    rankTopK(lshMultiProbeCandidates(queries, corpus, numPlanes, dim), k)

  /** Scored (query, candidate) pairs from the multi-probe bucket join —
    * the shared candidate stage of [[lshMultiProbeTopK]] and
    * [[hardNegativeTopKLsh]]. */
  private def lshMultiProbeCandidates(queries: DataFrame, corpus: DataFrame,
                                      numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val qb = withNorm(queries).withColumn("bucket", signBucket(col("vec"), planes))
    val cb = withNorm(corpus).withColumn("bucket", signBucket(col("vec"), planes))
    // probe set: own bucket + each one-bit flip
    val flips = (0 until numPlanes).map { i =>
      concat(
        substring(col("bucket"), 1, i),
        when(substring(col("bucket"), i + 1, 1) === "1", "0").otherwise("1"),
        substring(col("bucket"), i + 2, numPlanes - i - 1))
    }
    val probed = qb.withColumn("probe", explode(array((col("bucket") +: flips): _*)))
    // no dedup needed: a corpus vector lives in exactly one bucket and a
    // query's probe strings (own bucket + one flip per position) are
    // pairwise distinct, so each (query, candidate) pair matches at most
    // one probe — a distinct() here would shuffle the widest frame in the
    // job for zero semantic effect
    cb.as("c")
      .join(broadcast(probed.as("q")),
        col("q.probe") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("vec_id"),
        r6(cosinePrenormed(col("q.vec"), col("c.vec"),
          col("q.__norm") * col("c.__norm"))).as("cos_sim"))
  }

  /** [[hardNegativeTopK]]'s corpus-scale sibling: hard-negative mining
    * over multi-probe LSH candidates instead of the full anchor × corpus
    * cross product. The exact path's work is inherently QUADRATIC when
    * anchors are corpus-proportional (its contract: 800M dot products at
    * a mere 200k vectors / 2% anchors — measured 122 s, arithmetic not
    * plan); here each anchor scores only its probed buckets, so work
    * scales with corpus × (bucket occupancy), the ann_lsh_multiprobe
    * shape. Duplicate exclusion (cos ≥ dupThreshold) still happens
    * BEFORE ranking, so surviving slots hold usable negatives; with
    * bucketed candidates the guarantee is approximate — an anchor whose
    * probed buckets hold fewer than k non-dup neighbors returns fewer
    * rows (mining, not retrieval, so under-filling is the honest answer).
    */
  def hardNegativeTopKLsh(queries: DataFrame, corpus: DataFrame, k: Int,
                          dupThreshold: Double, numPlanes: Int, dim: Int): DataFrame =
    rankTopK(
      lshMultiProbeCandidates(queries, corpus, numPlanes, dim)
        .filter(col("cos_sim") < dupThreshold),
      k)

  /** How many corpus vectors the EXACT mining path is allowed: beyond
    * this, anchors-proportional × corpus dot products are arithmetic no
    * plan can fix (measured 122 s at a mere 200k vectors / 2% anchors),
    * and [[hardNegatives]] switches to the LSH path (12.1 s on the same
    * input, 3.1x for 10x data). */
  val HardNegativeExactMaxCorpus: Long = 100000L

  /** The PRODUCTION entry point for hard-negative mining. The exact
    * kernel ([[hardNegativeTopK]]) is corpus-quadratic BY CONTRACT when
    * anchors are corpus-proportional — it exists as the verification
    * reference (provably complete slots; the gate runs it at small SF to
    * pin the LSH path's answers). Callers pass `corpusVectors` from
    * catalog statistics (never a count() job here — plan construction
    * stays job-free); at or below [[HardNegativeExactMaxCorpus]] the
    * reference runs, above it mining dispatches to
    * [[hardNegativeTopKLsh]], whose work scales with bucket occupancy
    * instead of anchors × corpus. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    dupThreshold: Double, numPlanes: Int, dim: Int,
                    corpusVectors: Long,
                    exactMaxCorpus: Long = HardNegativeExactMaxCorpus): DataFrame =
    if (corpusVectors <= exactMaxCorpus) hardNegativeTopK(queries, corpus, k, dupThreshold)
    else hardNegativeTopKLsh(queries, corpus, k, dupThreshold, numPlanes, dim)

  /** IVF-style ANN: a coarse quantizer assigns every vector to its nearest
    * centroid (squared-L2, deterministic tie-break on centroid id); queries
    * search only their own bucket. With K centroids the corpus scan per
    * query drops to ~1/K — the standard inverted-file recall/latency trade,
    * and unlike sign-LSH the buckets adapt to the data distribution.
    *
    * Distances use the dot-product expansion (|a|² - 2a·b + |b|²) folded in
    * a fixed order and rounded before ranking, so the oracle reproduces
    * bucket assignments exactly.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame, k: Int): DataFrame =
    ivfTopKProbes(queries, corpus, centroids, k, nprobe = 1)

  /** Multi-probe IVF: each query searches its `nprobe` nearest centroid
    * buckets instead of one — the standard IVF recall lever (corpus vectors
    * just inside a neighboring Voronoi cell are invisible to single-probe).
    * Cost scales linearly with nprobe while staying ~nprobe/K of the full
    * scan; candidates cannot duplicate (each corpus vector lives in exactly
    * one bucket, and a query's probed buckets are distinct).
    */
  def ivfTopKProbes(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                    k: Int, nprobe: Int): DataFrame = {
    val cent = centroids.select(col("id").as("cid"), col("vec").as("cvec"))
    def buckets(df: DataFrame, n: Int): DataFrame = withNorm(
      assignNearest(df, cent, n).select(col("id"), col("vec"), col("cid").as("bucket")))
    bucketJoinTopK(buckets(queries, nprobe), buckets(corpus, 1), k)
  }

  /** Deterministic k-means-lite training for the IVF quantizer: seeds are
    * the k lowest-id vectors, then `iters` Lloyd steps run as DataFrame
    * aggregations (assign = windowed argmin like ivfTopK, update = per-
    * cluster mean rounded to 6 decimals so run-to-run float-order noise
    * cannot move a centroid). Only the k centroid vectors ever reach the
    * driver — the training data never does.
    *
    * Standard Lloyd caveat: a seed centroid that captures zero vectors in
    * some step disappears (the update aggregates only over assigned
    * vectors), so the result can carry FEWER than k centroids — callers
    * sizing nprobe against k should read the actual count from the
    * returned frame.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    var cent = corpus.orderBy(col("id").asc).limit(k)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    for (_ <- 0 until iters) {
      val assigned = assignNearest(corpus, cent).select(col("cid"), col("vec"))
      cent = assigned
        .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(r6(avg(col("x"))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p.getField("m")).as("cvec"))
        // truncate lineage: each Lloyd step otherwise embeds every prior one
        .localCheckpoint(true)
    }
    cent.select(col("cid").as("id"), col("cvec").as("vec"))
  }

  /** Mean within-cluster squared distance — training-quality metric. */
  def inertia(corpus: DataFrame, centroids: DataFrame): Double = {
    val cent = centroids.select(col("id").as("cid"), col("vec").as("cvec"))
    assignNearest(corpus, cent).agg(avg(col("__dist"))).head().getDouble(0)
  }

  /** SemDedup (semantic dedup over embeddings): assign every vector to its
    * nearest centroid (the same deterministic quantizer contract as ivfTopK),
    * then within each cluster drop any vector that has a too-similar
    * (cosine >= minCos) neighbor with a smaller id — the deterministic
    * greedy-by-id variant of the published keep-one-per-similar-group rule.
    *
    * Scale shape: the pair comparison is confined to cluster buckets (never
    * a corpus cross-product), and the number of centroids must grow with
    * the corpus to bound cluster width — prefer [[semDedupAuto]], which
    * derives k = ⌈n/targetClusterSize⌉, unless a pre-trained quantizer is
    * supplied (a FIXED k makes the per-cluster pair stage quadratic in the
    * corpus). Centroids are broadcast for assignment; the only shuffles are
    * the cluster-keyed self-join and the final keep flag join.
    *
    * Returns one row per corpus vector: (vec_id, cluster, keep).
    */
  def semDedup(corpus: DataFrame, centroids: DataFrame, minCos: Double): DataFrame = {
    val cent = centroids.select(col("id").as("cid"), col("vec").as("cvec"))
    val clustered = withNorm(
      assignNearest(corpus, cent).select(col("id"), col("vec"), col("cid").as("cluster")))
    val dropped = clustered.as("a")
      .join(clustered.as("b"), col("a.cluster") === col("b.cluster") && col("b.id") < col("a.id"))
      .filter(r6(cosinePrenormed(col("a.vec"), col("b.vec"),
        col("a.__norm") * col("b.__norm"))) >= minCos)
      .select(col("a.id").as("vec_id")).distinct()
      .withColumn("__dup", lit(true))
    clustered.select(col("id").as("vec_id"), col("cluster"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("__dup").isNull.as("keep"))
  }

  /** [[semDedup]] with the centroid count derived from the corpus instead
    * of caller-chosen: k = ⌈n / targetClusterSize⌉, trained with
    * [[kmeansCentroids]]. The in-cluster pair stage is ~c²/2 per cluster,
    * so a FIXED k means per-cluster cost grows quadratically with the
    * corpus — scaling k with n pins expected cluster width to
    * `targetClusterSize` and keeps total pair work linear in n (modulo
    * cluster skew, which the spec bounds). 1024 is the published SemDedup
    * operating point's order of magnitude; the single corpus `count()` is
    * a scalar by contract.
    */
  def semDedupAuto(corpus: DataFrame, minCos: Double,
                   targetClusterSize: Int = 1024, iters: Int = 2): DataFrame = {
    require(targetClusterSize >= 2,
      s"semDedupAuto needs targetClusterSize >= 2, got $targetClusterSize")
    val n = corpus.count()
    val k = math.max(1, math.ceil(n.toDouble / targetClusterSize).toInt)
    semDedup(corpus, kmeansCentroids(corpus, k, iters), minCos)
  }

  /** Cosine near-duplicate pairs within blocking groups: only pairs sharing
    * `blockCol` are compared (at scale the block key is an LSH bucket or
    * cluster id — never the full cross product). `leftPred` optionally
    * samples the left side.
    */
  def nearDupPairs(df: DataFrame, id: Column, vec: Column, blockCol: Column,
                   leftPred: Column, minCos: Double): DataFrame = {
    // the sampled side keeps ALL its block neighbors: pairs where both sides
    // are sampled are emitted once (smaller id left); pairs whose partner is
    // unsampled are kept regardless of id order
    val base = withNorm(df.select(id.as("id"), toDoubleArray(vec).as("vec"), blockCol.as("blk")))
      .withColumn("__q", leftPred)
    base.filter(col("__q")).as("a")
      .join(base.as("b"), col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id") &&
        (col("a.id") < col("b.id") || !col("b.__q")))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        r6(cosinePrenormed(col("a.vec"), col("b.vec"),
          col("a.__norm") * col("b.__norm"))).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Recall@k of an approximate top-k against the exact one — the
    * evaluation loop that tunes numPlanes/nprobe before committing an
    * index choice at corpus scale. Inputs are top-k RESULT frames
    * ((query_id, vec_id) rows, already rank-limited), so both sides are
    * queries×k-sized — the join is tiny regardless of corpus size and the
    * per-query aggregation is map-side combinable.
    *
    * Returns (query_id, n_exact, n_hit, recall); recall counts the exact
    * neighbors the approximate index recovered.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("query_id"), col("vec_id"))
    // queries×k rows by contract — broadcast unconditionally rather than
    // waiting for AQE (the static plan would otherwise sort-merge)
    val a = broadcast(approx.select(col("query_id"), col("vec_id"), lit(1L).as("__hit")))
    e.join(a, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        r6(col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  /** Per-dimension corpus statistics of an embedding column — the
    * whitening/normalization-prep pass (PCA-whitening, mean-centering, and
    * quantizer range calibration all start from exactly these numbers).
    *
    * Scale shape: one posexplode then ONE map-side-combinable aggregation
    * keyed on the dimension index (cardinality = embedding width, so the
    * reduce side is trivially small at any corpus size).
    *
    * Numeric determinism (the oracle-parity discipline for float
    * reductions): each element is widened float→double (exact), half-up
    * quantized to 6 decimals with the portable floor arithmetic, and summed
    * as DECIMAL(38,6) — an ORDER-INDEPENDENT exact sum, immune to the
    * partition-order nondeterminism a double sum would have. Mean and
    * variance divide the exact sums as doubles and re-quantize.
    */
  def dimStats(df: DataFrame, vec: Column): DataFrame = {
    val r6 = graft.util.Portable.round6 _
    df.select(posexplode(vec).as(Seq("dim", "x")))
      .select(col("dim"), r6(col("x").cast("double")).as("xr"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xr").cast("decimal(38,6)")).as("__sum"),
        sum((col("xr") * col("xr")).cast("decimal(38,12)")).as("__sumsq"),
        min(col("xr")).as("min_x"),
        max(col("xr")).as("max_x"))
      .select(col("dim"), col("n"),
        r6(col("__sum").cast("double") / col("n")).as("mean_x"),
        r6(col("__sumsq").cast("double") / col("n")
          - (col("__sum").cast("double") / col("n"))
            * (col("__sum").cast("double") / col("n"))).as("var_x"),
        col("min_x"), col("max_x"))
  }
}
