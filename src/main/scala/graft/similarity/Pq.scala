package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Product quantization (PQ) — the canonical billion-vector ANN compression
  * (Jegou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; the IVF-PQ pairing is what FAISS ships at scale).
  *
  * The d-dimensional space is split into `m` subspaces of d/m dimensions;
  * each subspace gets its own ksub-centroid codebook, and a vector is
  * stored as m small centroid ids — at ksub <= 256 that is m BYTES per
  * vector instead of 8d (a 64-dim double embedding compresses 64x at m=8).
  * Search uses asymmetric distance computation (ADC): per query, ONE
  * m x ksub table of query-subvector-to-centroid distances is precomputed,
  * and every candidate costs m table lookups + adds instead of a
  * d-dimensional arithmetic pass.
  *
  * Why this matters at 100 TB: int8 quantization (Knn.quantizeInt8) buys
  * 4x; PQ buys 32-64x, which is the difference between an index that fits
  * in cluster memory and one that doesn't. The scan stays embarrassingly
  * parallel — codes are a plain column, the query tables broadcast, and
  * the ADC kernel is a codegen'd expression (AdcLookupSum) — so the plan
  * shape is identical to the brute-force scan, just over m bytes/row.
  *
  * Determinism contract (same discipline as Knn): seeded by lowest-id
  * vectors, per-step means and distances rounded via Portable.round6,
  * ties broken on centroid id — training, encoding, and search are
  * bit-reproducible across runs and partitionings.
  */
object Pq {

  private val r6 = graft.util.Portable.round6 _
  private def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Explode rows with a `vec` column into subvector rows: every other
    * column rides along, `vec` is replaced by (sub, svec). `dim` must be
    * divisible by `m`; subspace s covers components [s*d/m, (s+1)*d/m). */
  private def subvectors(df: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    val subs = (0 until m).map { s =>
      struct(lit(s).as("sub"), slice(col("vec"), s * dsub + 1, dsub).as("svec"))
    }
    val keep = df.columns.filter(_ != "vec").map(col).toSeq
    df.select(keep :+ explode(array(subs: _*)).as("e"): _*)
      .select(keep ++ Seq(col("e.sub").as("sub"), col("e.svec").as("svec")): _*)
  }

  /** Nearest-codebook-centroid assignment per (vector, subspace): the PQ
    * sibling of Knn's coarse assignNearest — same squared-L2 expansion with
    * precomputed self-dots, same r6 + centroid-id tie-break, but keyed on
    * the subspace so all m codebooks assign in ONE broadcast join.
    *
    * The argmin is a lexicographic min(struct(dist, cid, svec)) aggregation
    * rather than a sort-window: identical semantics (cid is unique per
    * group, so the comparison never reaches svec), but the hash aggregate
    * combines map-side — the shuffle carries one row per (vector,
    * subspace) instead of ksub rows, the difference between encode being
    * join-bound and shuffle-bound over a dense corpus. */
  private def assignSub(subvecs: DataFrame, codebook: DataFrame): DataFrame =
    subvecs.withColumn("__s2", dot(col("svec"), col("svec")))
      .join(broadcast(codebook.withColumn("__c2", dot(col("cvec"), col("cvec")))), Seq("sub"))
      .withColumn("__dist", r6(
        col("__s2") - lit(2.0) * dot(col("svec"), col("cvec")) + col("__c2")))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("__dist"), col("cid"), col("svec"))).as("m"))
      .select(col("id"), col("sub"), col("m.cid").as("cid"),
        col("m.svec").as("svec"), col("m.__dist").as("__dist"))

  /** Train the m per-subspace codebooks with Lloyd steps run JOINTLY across
    * all subspaces (one corpus pass per iteration, keyed on (sub, cid) —
    * never m separate jobs). Seeds are the ksub lowest-id vectors'
    * subvectors, mirroring Knn.kmeansCentroids.
    *
    * Every Lloyd iteration scans `corpus`, so at scale the caller should
    * pass a bounded deterministic sample (a few hundred vectors per
    * centroid — e.g. `corpus.orderBy(id).limit(256 * ksub)`), never the
    * full table: quantizer quality saturates long before the sample does,
    * and encode/search are the only stages that must see every vector.
    *
    * Returns (sub, cid, cvec) with cids re-numbered DENSE per subspace
    * (0..count-1): Lloyd can drop a centroid that captures zero vectors,
    * and the ADC table is positional — a hole in the id space would
    * silently misalign every lookup after it (pinned in PqSpec).
    */
  def train(corpus: DataFrame, m: Int, dim: Int, ksub: Int, iters: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(ksub >= 1 && iters >= 0, s"need ksub >= 1, iters >= 0")
    val dsub = dim / m
    val spark = corpus.sparkSession
    // Driver-held Lloyd state (round 15, guide §1.2 "the distributed
    // algorithm first"): the codebook is m×ksub centroids — MODEL state,
    // never data, the same carve-out as the GLM moment solve. The former
    // all-DataFrame loop paid per iteration: a broadcast build for the
    // codebook join, an argmin shuffle, two collect_list shuffles and an
    // eager localCheckpoint (~6 jobs/iteration; measured 1.8 s warm for a
    // 4096-row sample at ksub=16). Holding the codebook on the driver
    // turns each Lloyd step into ONE map-side-combinable aggregation job:
    // assignment runs fused and row-local (PqEncodeCodes — bit-identical
    // to the join argmin, pinned in PqSpec), and only the m·ksub·(d/m)
    // per-position means come back. Assignment and mean arithmetic are
    // unchanged: same (s2 - 2·dot) + c2 / round6 distances, same
    // ascending-cid strict-less argmin, same r6(avg(x)) per
    // (sub, cid, pos) Spark aggregation.
    //
    // Empty-centroid semantics are preserved positionally: a centroid that
    // captures zero vectors vanishes from the mean frame exactly as it
    // vanished from the joined groupBy; survivors are compacted in
    // ascending-cid order, which leaves both the argmin tie-break order
    // and the final dense re-numbered output identical. Null or
    // wrong-length vectors encode to NULL codes and are excluded from the
    // means (the joined path had no defined assignment for them either).
    // already ascending-id ordered: TakeOrderedAndProject returns the
    // collected rows in sort order, so no driver re-sort — which also
    // keeps seeding type-agnostic over any orderable id column (the former
    // getLong re-sort ClassCastException'd on int/string ids, ADVICE r15)
    val seeds = corpus.orderBy(col("id").asc).limit(ksub)
      .select(col("id"), col("vec")).collect()
    seeds.foreach { r =>
      require(!r.isNullAt(1) && r.getSeq[Double](1).length == dim,
        s"PQ training seed ${r.get(0)} has a null or wrong-length vec (need $dim)")
    }
    var cb: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      seeds.map(_.getSeq[Double](1).slice(s * dsub, (s + 1) * dsub).toArray)
    }
    for (_ <- 0 until iters) {
      val codesCol = graft.functions.VectorExpressions.pqEncodeCodes(col("vec"), cb)
      val subStructs = (0 until m).map { s =>
        struct(lit(s).as("sub"), element_at(col("codes"), s + 1).as("cid"),
          slice(col("vec"), s * dsub + 1, dsub).as("svec"))
      }
      val moments = corpus.select(col("vec"), codesCol.as("codes"))
        .filter(col("codes").isNotNull)
        .select(explode(array(subStructs: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.cid").as("cid"),
          posexplode(col("e.svec")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(r6(avg(col("x"))).as("mu"))
        .collect()
      // rebuild: survivors per subspace in ascending (compacted) cid order
      val bySub = moments.groupBy(_.getInt(0))
      cb = (0 until m).toArray.map { s =>
        bySub.getOrElse(s, Array.empty[org.apache.spark.sql.Row]).toArray
          .groupBy(_.getInt(1)).toArray.sortBy(_._1)
          .map { case (_, rows) =>
            val mu = new Array[Double](dsub)
            rows.foreach(r => mu(r.getInt(2)) = r.getDouble(3))
            mu
          }
      }
      require(cb.forall(_.nonEmpty),
        "PQ training lost every centroid in a subspace (empty corpus?)")
    }
    // dense ids by construction: array index == cid
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("sub", IntegerType, nullable = false),
      StructField("cid", IntegerType, nullable = false),
      StructField("cvec", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = for { s <- 0 until m; c <- cb(s).indices }
      yield Row(s, c, cb(s)(c).toSeq)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Collect the (sub, cid, cvec) codebook frame to nested driver arrays,
    * validating the dense-cid contract. Bounded by m x ksub rows — the
    * same driver-side metadata carve-out as the GLM moment solve. */
  def collectCodebook(codebook: DataFrame): Array[Array[Array[Double]]] = {
    val rows = codebook.select(col("sub"), col("cid"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(t => (t._1, t._2))
    val bySub = rows.groupBy(_._1)
    val m = bySub.size
    require((0 until m).forall(bySub.contains), s"subspaces not dense: ${bySub.keys}")
    (0 until m).toArray.map { s =>
      val cs = bySub(s).sortBy(_._2)
      require(cs.zipWithIndex.forall { case (c, i) => c._2 == i },
        s"centroid ids not dense in subspace $s")
      cs.map(_._3)
    }
  }

  /** Encode every corpus vector as its m nearest-centroid ids:
    * (id, codes array<int> ordered by subspace). This is the stored index —
    * m small ints per vector; the raw vectors are only needed again for
    * exact re-ranking of a shortlist.
    *
    * Runs as ONE row-local projection with the fused PqEncodeCodes kernel
    * (codebook attached to the plan): zero shuffle, zero row fan-out —
    * the shape that survives a billion-vector corpus. `encodeByJoin` is
    * the same assignment via the broadcast join + argmin aggregation
    * (bit-identical by contract, pinned in PqSpec); it exists as the
    * parity witness and the path for codebooks too large to hold on the
    * driver. */
  def encode(corpus: DataFrame, codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    val cb = collectCodebook(codebook)
    require(cb.length == m && cb(0)(0).length * m == dim,
      s"codebook shape ${cb.length}x?x${cb(0)(0).length} does not match m=$m dim=$dim")
    corpus.select(col("id"),
      graft.functions.VectorExpressions.pqEncodeCodes(col("vec"), cb).as("codes"))
  }

  /** Join-based encode twin (see `encode`). */
  def encodeByJoin(corpus: DataFrame, codebook: DataFrame, m: Int, dim: Int): DataFrame =
    assignSub(subvectors(corpus, m, dim), codebook)
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("sc"))
      .select(col("id"), transform(col("sc"), x => x.getField("cid").cast("int")).as("codes"))

  /** Per-(query, probe-bucket) ADC distance tables:
    * (id, bucket, table array<array<double>>), where table[sub][cid] =
    * squared-L2 from the query row's (residual) vector subspace to that
    * codebook centroid. queries x probes x m x ksub rows while building —
    * tiny for a broadcastable query set — collapsed to one row per
    * (query, bucket). The plain-PQ path passes a single constant bucket. */
  private def queryTables(queries: DataFrame, codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    // Row-local table construction against the driver-collected codebook
    // (round 15): the former explode → broadcast join → two collect_list
    // shuffles cost ~4 stages per call to assemble what is a pure
    // per-query-row function of (vec, codebook). The codebook is always
    // driver-safe here — each emitted table row is strictly larger than
    // the whole codebook, and the tables broadcast to the ADC join anyway.
    // Arithmetic unchanged and pinned (PqSpec): same per-centroid
    // left-to-right self-dot, same (s2 - 2·dot) + c2 fold, same r6; the
    // positional [sub][cid] layout relied on train()'s dense-cid contract
    // before and is dense by construction now.
    val dsub = dim / m
    val cb = collectCodebook(codebook)
    require(cb.length == m && cb.forall(_.forall(_.length == dsub)),
      s"codebook shape does not match m=$m dim=$dim")
    val c2: Array[Array[Double]] = cb.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    })
    val table = array((0 until m).map { s =>
      val svec = slice(col("vec"), s * dsub + 1, dsub)
      val s2 = dot(svec, svec)
      array(cb(s).indices.map { c =>
        val cvec = array(cb(s)(c).toIndexedSeq.map(lit): _*)
        r6(s2 - lit(2.0) * dot(svec, cvec) + lit(c2(s)(c)))
      }: _*)
    }: _*)
    queries.select(col("id"), col("bucket"), table.as("table"))
  }

  /** PQ-approximate top-k by ADC: broadcast the per-query tables against
    * the code column, rank ascending approximate distance (vec_id
    * tie-break). Returns (query_id, vec_id, adc_dist, rank). Same
    * shared-id-space contract as Knn (queries drawn from the corpus;
    * self-matches excluded by id). */
  def adcTopK(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
              k: Int, m: Int, dim: Int): DataFrame = {
    val qt = queryTables(queries.select(col("id"), lit(0L).as("bucket"), col("vec")),
      codebook, m, dim)
    val scored = codes.as("c")
      .join(broadcast(qt.as("q")), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("vec_id"),
        r6(VectorExpressions.adcLookupSum(col("c.codes"), col("q.table"))).as("adc_dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Two-stage PQ search, the production shape: ADC shortlists `shortlist`
    * candidates per query over the compressed codes, then ONLY those rows'
    * raw vectors are fetched and exactly re-ranked by cosine under Knn's
    * ranking contract (r6, desc, vec_id tie-break). Returns
    * (query_id, vec_id, cos_sim, rank) — schema-compatible with
    * Knn.bruteForceTopK, and provably identical to it when `shortlist`
    * covers the corpus (pinned in PqSpec). */
  def refinedTopK(queries: DataFrame, corpus: DataFrame, codes: DataFrame,
                  codebook: DataFrame, k: Int, shortlist: Int, m: Int, dim: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val cand = adcTopK(queries, codes, codebook, shortlist, m, dim)
      .select(col("query_id"), col("vec_id"))
    // the shortlist (queries x shortlist rows) broadcasts against the
    // corpus scan — the corpus is never shuffled to fetch the raw vectors
    val withVecs = corpus.select(col("id").as("vec_id"), col("vec").as("cvec"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qvec"))),
        Seq("query_id"))
    val denom = sqrt(dot(col("qvec"), col("qvec"))) * sqrt(dot(col("cvec"), col("cvec")))
    val scored = withVecs.select(col("query_id"), col("vec_id"),
      r6(when(denom =!= 0.0, dot(col("qvec"), col("cvec")) / denom)).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---------------------------------------------------------------------
  // IVF-PQ: coarse inverted file + PQ over RESIDUALS — the FAISS billion-
  // scale pairing. The coarse quantizer confines each query's scan to
  // nprobe buckets (the IVF trade Knn.ivfTopKProbes makes), and the PQ
  // codebook encodes v - centroid(v): residual magnitudes are much smaller
  // than raw vectors, so the same ksub centroids quantize far finer.
  // ---------------------------------------------------------------------

  /** Nearest coarse centroids per vector, keeping the residual:
    * (id, bucket, vec = v - centroid). With topN > 1, one row per probed
    * bucket — each with its OWN residual, which is why every downstream
    * stage keys on (id, bucket), never id alone. Same determinism contract
    * as Knn's assignment (r6 distances, centroid-id tie-break). */
  def residuals(df: DataFrame, centroids: DataFrame, topN: Int = 1): DataFrame = {
    val cent = centroids.select(col("id").as("cid"), col("vec").as("cvec"))
    val scored = df.withColumn("__v2", dot(col("vec"), col("vec")))
      .crossJoin(broadcast(cent.withColumn("__c2", dot(col("cvec"), col("cvec")))))
      .withColumn("__dist", r6(
        col("__v2") - lit(2.0) * dot(col("vec"), col("cvec")) + col("__c2")))
    val assigned = if (topN == 1) {
      // dense-corpus path: map-side-combinable argmin (same lexicographic
      // (dist, cid) contract as the window; vec/cvec never compared — cid
      // is unique per group)
      scored.groupBy(col("id"))
        .agg(min(struct(col("__dist"), col("cid"), col("cvec"), col("vec"))).as("m"))
        .select(col("id"), col("m.cid").as("cid"),
          col("m.vec").as("vec"), col("m.cvec").as("cvec"))
    } else {
      // multi-probe (query-side, tiny): windowed top-N
      val w = Window.partitionBy(col("id")).orderBy(col("__dist").asc, col("cid").asc)
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= topN)
        .select(col("id"), col("cid"), col("vec"), col("cvec"))
    }
    assigned.select(col("id"), col("cid").as("bucket"),
      zip_with(col("vec"), col("cvec"), (a, b) => a - b).as("vec"))
  }

  /** Train the PQ codebook on coarse-quantizer residuals. `centroids` is
    * the coarse quantizer ((id, vec), e.g. from Knn.kmeansCentroids). */
  def ivfPqTrain(corpus: DataFrame, centroids: DataFrame,
                 m: Int, dim: Int, ksub: Int, iters: Int): DataFrame =
    train(residuals(corpus, centroids).select(col("id"), col("vec")), m, dim, ksub, iters)

  /** Encode the corpus as (id, bucket, codes): each vector's coarse bucket
    * plus the PQ code of its residual. This pair of small columns IS the
    * index — bucket for pruning, codes for in-bucket ADC ranking. */
  def ivfPqEncode(corpus: DataFrame, centroids: DataFrame, codebook: DataFrame,
                  m: Int, dim: Int): DataFrame = {
    val res = residuals(corpus, centroids)
    encode(res.select(col("id"), col("vec")), codebook, m, dim)
      // a corpus vector lives in exactly one bucket, so the id-keyed join
      // back is unambiguous (queries, which probe many buckets, never come
      // through here)
      .join(res.select(col("id"), col("bucket")), Seq("id"))
      .select(col("id"), col("bucket"), col("codes"))
  }

  /** IVF-PQ approximate top-k: each query probes its `nprobe` nearest
    * coarse buckets, builds ONE residual ADC table per probed bucket, and
    * ranks only that bucket's codes — candidates are confined to
    * ~nprobe/K of the corpus AND scored over m-byte codes. The join is a
    * bucket equi-join against broadcast query tables (never a corpus
    * cross-product); a corpus vector lives in exactly one bucket and a
    * query's probed buckets are distinct, so no candidate can duplicate.
    * Returns (query_id, vec_id, adc_dist, rank). */
  def ivfPqTopK(queries: DataFrame, encoded: DataFrame, centroids: DataFrame,
                codebook: DataFrame, k: Int, nprobe: Int, m: Int, dim: Int): DataFrame = {
    val qres = residuals(queries, centroids, topN = nprobe)
    val qt = queryTables(qres, codebook, m, dim)
    val scored = encoded.as("c")
      .join(broadcast(qt.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("vec_id"),
        r6(graft.functions.VectorExpressions.adcLookupSum(col("c.codes"), col("q.table")))
          .as("adc_dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
