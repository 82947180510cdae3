package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ShingleUtil
import graft.functions.TokenCount.tokenCount
import graft.text.TextFeatures

/** Property-based invariants for the expression-level operators, driven by
  * ScalaCheck generators with a fixed seed (deterministic across runs).
  * Pure-JVM properties run without Spark; a final Spark check pins the
  * expression and JVM implementations together.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("distinctShingles: every shingle has exactly n words and appears in the text") {
    for (t <- samples(text, 200); n <- 2 to 4) {
      val sh = ShingleUtil.distinctShingles(t, n)
      assert(sh.distinct.length == sh.length)
      sh.foreach { s =>
        assert(s.split(" ", -1).length == n, s"'$s' in '$t'")
        assert(t.contains(s))
      }
    }
  }

  test("shingle count matches sliding-window arithmetic") {
    for (t <- samples(text, 200)) {
      val words = t.split(" ", -1)
      val expected =
        if (words.length < 3) 0
        else words.sliding(3).map(_.mkString(" ")).toSeq.distinct.length
      assert(ShingleUtil.distinctShingles(t, 3).length == expected, s"text='$t'")
    }
  }

  test("md5Base32 equals parsing the first 8 hex chars of md5Hex") {
    for (s <- samples(word, 300)) {
      assert(ShingleUtil.md5Base32(s) == java.lang.Long.parseLong(ShingleUtil.md5Hex(s).take(8), 16))
    }
  }

  test("valueNtilesDist equals the window-NTILE formulation on random frames") {
    // random (group, value, id) frames with heavy ties; every k in 1..7
    val row = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-5, 5) // small range forces duplicate values
    } yield (g, v.toDouble)
    for (seed <- 0 until 4) {
      val rows = samples(Gen.listOfN(120, row), 1).head
        .zipWithIndex.map { case ((g, v), i) => (g, v, (i + seed * 1000).toLong) }
      val df = rows.toDF("g", "v", "id")
      for (k <- Seq(1, 2, 3, 7)) {
        val viaWindow = df
          .withColumn("tile", ntile(k).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("g")).orderBy(col("v"), col("id"))))
          .groupBy(col("g"), col("tile"))
          .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
          .collect().map(r => (r.getString(0), r.getInt(1)) ->
            ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
        val viaDist = graft.analysis.Stats
          .valueNtilesDist(df, col("g"), col("v"), col("id"), k)
          .collect().map(r => (r.getString(0), r.getInt(1)) ->
            ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
        assert(viaDist == viaWindow, s"k=$k seed=$seed")
      }
    }
  }

  test("TokenCount expression equals regex token count on generated text") {
    val token = Gen.oneOf(word, Gen.const("!!"), Gen.const("42"), Gen.const("a1b2"))
    val texts = samples(Gen.listOf(token).map(_.mkString(" ")), 120)
    val df = texts.toDF("t")
    val mism = df.select(tokenCount(col("t")).as("a"), TextFeatures.regexTokenCount(col("t")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mism == 0)
  }

  test("chunkDocs covers every word and respects the overlap arithmetic") {
    import graft.curation.Curation
    val texts = samples(text, 60).filter(_.nonEmpty).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for ((window, stride) <- Seq((4, 4), (6, 4), (8, 3))) {
      val chunks = Curation.chunkDocs(df, col("doc_id"), col("text"), window, stride)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      val byDoc = chunks.groupBy(_._1)
      texts.zipWithIndex.foreach { case (t, i) =>
        val words = t.split(" ", -1)
        val got = byDoc(i.toLong).sortBy(_._2).map(_._3)
        // chunk c starts at c*stride and takes `window` words
        got.zipWithIndex.foreach { case (chunk, c) =>
          assert(chunk == words.slice(c * stride, c * stride + window).mkString(" "))
        }
        // full coverage: the last chunk reaches the final word
        assert((got.length - 1) * stride + window >= words.length)
        // no empty trailing chunk
        assert((got.length - 1) * stride < words.length)
      }
    }
  }

  test("packStats conserves documents and tokens at every (ctx, shard) choice") {
    import graft.curation.Curation
    val docs = samples(Gen.chooseNum(0L, 50L), 400).zipWithIndex
      .map { case (tok, i) => (i.toLong, tok) }.toDF("doc_id", "n_tok")
    for (ctx <- Seq(7, 64, 1000); shards <- Seq(1, 5)) {
      val out = Curation.packStats(docs, col("doc_id"), col("n_tok"),
        Curation.hashShard(col("doc_id"), shards), ctx).collect()
      assert(out.map(_.getLong(2)).sum == 400L)                 // every doc in exactly one chunk
      assert(out.map(_.getLong(3)).sum == docs.agg(sum("n_tok")).head.getLong(0))
      // per shard: ids start at 0 and never exceed the token-mass bound
      // (a doc longer than ctx legitimately skips the chunks it spans)
      out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val ids = rows.map(_.getLong(1))
        val toks = rows.map(_.getLong(3)).sum
        assert(ids.min == 0L)
        assert(ids.max <= toks / ctx, s"max chunk ${ids.max} vs ${toks / ctx}")
      }
    }
  }

  test("lineDedup keeps each distinct line exactly once corpus-wide") {
    import graft.curation.Curation
    val line = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon zeta")
    val doc = Gen.nonEmptyListOf(line)
    val corpus = samples(doc, 80)
    val docs = corpus.zipWithIndex
      .map { case (ls, i) => (i.toLong, ls) }.toDF("doc_id", "lines")
    val out = Curation.lineDedup(docs, col("doc_id"), col("lines")).collect()
    val keptLines = out.flatMap(r => r.getString(3).split("\n", -1).filter(_.nonEmpty))
    // every distinct line survives exactly once across the whole corpus
    assert(keptLines.sorted.toSeq == corpus.flatten.distinct.sorted)
    // accounting adds up
    out.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("budgetFill: kept docs are exactly a quality-ordered prefix per slice") {
    val tok = Gen.choose(1L, 50L)
    val q = Gen.oneOf(0.2, 0.5, 0.7, 1.0)
    val row = for { t <- tok; qq <- q; s <- Gen.oneOf("A", "B", "C") } yield (t, qq, s)
    val rows = samples(row, 120).zipWithIndex
      .map { case ((t, qq, s), i) => (i.toLong, s, t, qq) }
    val df = rows.toDF("doc_id", "slice", "n_tok", "q")
    val out = graft.curation.Curation.budgetFill(df,
        col("doc_id"), col("slice"), col("n_tok"), col("q"), 200L)
      .collect().map(r =>
        (r.getString(1), r.getLong(0), r.getLong(2), r.getDouble(3), r.getLong(4), r.getBoolean(5)))
    out.groupBy(_._1).foreach { case (_, g) =>
      // the fill order (ascending cum_tok) must BE quality-desc, id-asc —
      // an inverted window (keeping each slice's worst docs) would still
      // telescope, so order is asserted explicitly
      val ordered = g.sortBy(_._5)
      ordered.sliding(2).foreach {
        case Array((_, id1, _, q1, _, _), (_, id2, _, q2, _, _)) =>
          assert(q1 > q2 || (q1 == q2 && id1 < id2),
            s"fill order must be quality desc, id asc: ($q1,$id1) before ($q2,$id2)")
        case _ =>
      }
      val kept = ordered.takeWhile(_._6)
      assert(ordered.drop(kept.length).forall(!_._6), "kept rows must form a prefix")
      assert(kept.forall(_._5 <= 200L))
      assert(ordered.drop(kept.length).forall(_._5 > 200L))
      var cum = 0L
      ordered.foreach { t => cum += t._3; assert(t._5 == cum, "running sum must telescope") }
    }
  }

  test("edit similarity is 1.0 exactly on equal texts and symmetric under swap") {
    for (t <- samples(text, 60) if t.split(" ", -1).length >= 3) {
      val variant = t.replaceFirst("a", "b")
      val df = Seq((1L, t), (2L, t), (3L, variant)).toDF("doc_id", "text")
      val pairs = graft.dedup.Dedup.editSimilarityVerified(
          df, col("doc_id"), col("text"), 3, 16, 4, 0.0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // identical docs always land in the same LSH bucket: sim exactly 1.0
      assert(pairs.get((1L, 2L)).contains(1.0), s"text='$t'")
      // similarity is orientation-free: (1,3) and (2,3) see the same pair
      (pairs.get((1L, 3L)), pairs.get((2L, 3L))) match {
        case (Some(x), Some(y)) => assert(x == y)
        case _ => // variant may legitimately miss the bucket when 'a' edit shifts shingles
      }
    }
  }

  test("minhash base hashes are stable and signature mins are order-independent") {
    for (t <- samples(text, 100) if t.split(" ", -1).length >= 3) {
      val hs = ShingleUtil.distinctShingles(t, 3).map(ShingleUtil.md5Base32)
      val shuffled = scala.util.Random.shuffle(hs.toSeq)
      for (p <- 0 until 4) {
        val a = graft.dedup.Dedup.minhashA(p); val b = graft.dedup.Dedup.minhashB(p)
        val prime = graft.dedup.Dedup.minhashPrime
        val m1 = hs.map(h => (h * a + b) % prime).min
        val m2 = shuffled.map(h => (h * a + b) % prime).min
        assert(m1 == m2)
      }
    }
  }

  test("BPE: encode round-trips any word under any trained merge table") {
    import graft.text.Bpe
    val corpus = Gen.listOfN(20,
      for (w <- word; f <- Gen.choose(1L, 50L)) yield (w, f))
    for (c <- samples(corpus, 50)) {
      val merges = Bpe.trainLocal(c, 30)
      val rank = merges.zipWithIndex.toMap
      // every trained word AND unseen probe words reassemble exactly
      for (w <- c.map(_._1) ++ samples(word, 5)) {
        val pieces = Bpe.encodeWord(w, rank)
        assert(pieces.mkString == w, s"round-trip broke: '$w' -> ${pieces.toSeq}")
        assert(pieces.forall(_.nonEmpty))
      }
    }
  }

  test("ksDrift: symmetric in sample labels, D in [0,1], equal samples give 0") {
    val pts = Gen.listOfN(60,
      for (v <- Gen.choose(0, 30); b <- Gen.oneOf(true, false)) yield (v.toDouble, b))
    for (c0 <- samples(pts, 8)) {
      // ensure both sides non-empty
      val c = (c0 :+ ((31.0, true)) :+ ((32.0, false)))
      val df = c.toDF("v", "b")
      val r1 = graft.analysis.Stats.ksDrift(df, col("v"), col("b")).collect().head
      val r2 = graft.analysis.Stats.ksDrift(df, col("v"), !col("b")).collect().head
      // relabeling the samples swaps n_a/n_b but cannot change D
      assert(r1.getAs[Double]("d_stat") === r2.getAs[Double]("d_stat"))
      assert(r1.getAs[Long]("n_a") === r2.getAs[Long]("n_b"))
      val d = r1.getAs[Double]("d_stat")
      assert(d >= 0.0 && d <= 1.0)
    }
    // a sample against an identical copy of itself: D exactly 0
    val same = (1 to 20).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
      .toDF("v", "b")
    assert(graft.analysis.Stats.ksDrift(same, col("v"), col("b"))
      .collect().head.getAs[Double]("d_stat") === 0.0)
  }

  test("weightedMedian: bounded by min/max, reduces to plain median at weight 1") {
    val pts = Gen.listOfN(25, Gen.choose(1, 100))
    for (c <- samples(pts, 10) if c.nonEmpty) {
      val df = c.map(v => ("g", v.toLong, 1L)).toDF("g", "v", "w")
      val got = graft.analysis.Stats.weightedMedian(df, col("g"), col("v"), col("w"))
        .collect().head.getLong(2)
      assert(got >= c.min && got <= c.max)
      // lower median of the sorted multiset under unit weights
      val sorted = c.sorted
      val expected = sorted((c.size - 1) / 2).toLong
      assert(got === expected, s"values=$c")
    }
  }

  test("intervalCoverage: bounded by n*len and by span+len; islands <= n") {
    val gaps = Gen.listOfN(12, Gen.choose(0L, 2000L))
    for (g <- samples(gaps, 10)) {
      val times = g.scanLeft(0L)(_ + _)
      val rows = times.zipWithIndex.map { case (t, i) =>
        (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), i.toLong)
      }
      val df = rows.toDF("u", "ts", "id")
      val r = graft.analysis.Stats.intervalCoverage(df, col("u"), col("ts"),
        col("id"), 600L).collect().head
      val covered = r.getAs[Long]("covered_sec")
      assert(covered <= rows.size * 600L)
      assert(covered <= (times.max - times.min) + 600L)
      assert(covered >= 600L) // at least one window
      assert(r.getAs[Long]("n_islands") >= 1 && r.getAs[Long]("n_islands") <= rows.size)
    }
  }

  test("BPE: merges are deterministic and monotone in numMerges") {
    import graft.text.Bpe
    val corpus = Gen.listOfN(15,
      for (w <- word; f <- Gen.choose(1L, 20L)) yield (w, f))
    for (c <- samples(corpus, 30)) {
      val m5 = Bpe.trainLocal(c, 5)
      val m10 = Bpe.trainLocal(c, 10)
      // a longer budget extends, never rewrites, the merge prefix
      assert(m10.take(m5.size) == m5)
      // input order never matters
      assert(Bpe.trainLocal(c.reverse, 10) == m10)
    }
  }

  test("prefixFilterJoin equals brute-force all-pairs Jaccard at any tau") {
    // the l-extended prefix + length-filter completeness argument, tested
    // the adversarial way: a 7-word vocabulary forces heavy shingle
    // sharing, doc lengths 3-12 exercise the tiny-set min(l, alpha)
    // floor, and tau = 2/3 lands tau*sz on integral knife edges
    val smallWord = Gen.oneOf("a", "b", "c", "d", "e", "f", "g")
    val doc = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, smallWord).map(_.mkString(" ")))
    val corpus = samples(doc, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = corpus.toDF("doc_id", "text")
    val sh = corpus
      .map { case (id, t) => id -> ShingleUtil.distinctShingles(t, 3).toSet }
      .filter(_._2.nonEmpty)
    for (tau <- Seq(0.3, 0.4, 0.5, 2.0 / 3.0, 0.75, 1.0)) {
      val expected = (for {
        (a, sa) <- sh
        (b, sb) <- sh if a < b
        i = (sa & sb).size
        if i.toDouble / (sa.size + sb.size - i) >= tau
      } yield (a, b)).toSet
      val got = graft.dedup.Dedup
        .prefixFilterJoin(df, col("doc_id"), col("text"), 3, tau)
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"tau=$tau missing=${expected -- got} extra=${got -- expected}")
    }
  }
}
