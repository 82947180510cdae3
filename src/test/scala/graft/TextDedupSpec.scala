package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TokenCount.tokenCount
import graft.similarity.Knn
import graft.text.TextFeatures

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("TokenCount matches the regex tokenizer on real documents") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val mism = docs.select(
      tokenCount(col("text")).as("fast"),
      TextFeatures.regexTokenCount(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mism == 0)
  }

  test("TokenCount counts letter/digit runs and handles empties") {
    val df = Seq("ab1 cd,, e9", "", "NOLOWER 42").toDF("t")
    val got = df.select(tokenCount(col("t"))).as[Long].collect().toSeq
    assert(got == Seq(3L, 0L, 1L))
  }

  test("shingles produce n-grams and empty below n") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(TextFeatures.shingles(col("t"), 3)).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("profiled langid scores any profile table and breaks ties by priority") {
    val df = Seq(
      "maji na chakula ni muhimu kwa watu",       // Swahili stopword hits
      "biyaha iyo cuntada waa muhiim oo badan",   // Somali
      "the cat sat in the hat",                   // English
      "zzz qqq")                                   // no hits anywhere
      .toDF("text")
    val pred = df.select(TextFeatures.langIdProfiled(col("text"),
      TextFeatures.defaultProfiles).last).as[String].collect().toSeq
    // the no-hit row ties every profile at 0 — the FIRST profile must win
    assert(pred == Seq("sw", "so", "en", "en"))
    // the 4-profile fixed scaffolding is the same machinery: identical
    // predictions on the original table
    val legacy = df.select(TextFeatures.langIdColumns(col("text")).last).as[String]
      .collect().toSeq
    val viaProfiles = df.select(TextFeatures.langIdProfiled(col("text"),
      Seq("en" -> TextFeatures.enStopwords, "es" -> TextFeatures.esStopwords,
        "fr" -> TextFeatures.frStopwords, "de" -> TextFeatures.deStopwords)).last)
      .as[String].collect().toSeq
    assert(legacy == viaProfiles)
  }

  test("keepBestPerComponent keeps the best-quality member, min id on ties") {
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "component")
    val qual = Seq((1L, 0.5), (2L, 0.8), (3L, 0.8), (7L, 0.7), (9L, 0.7))
      .toDF("doc_id", "qscore")
    val got = Dedup.keepBestPerComponent(comp, qual)
      .orderBy("component").as[(Long, Long, Long)].collect().toSeq
    // component 1: docs 2 and 3 tie at 0.8 → min id 2 wins over min-id-1
    // member (0.5); component 7: tie at 0.7 → 7
    assert(got == Seq((1L, 2L, 3L), (7L, 7L, 2L)))
    // a member with no quality row fails loudly — a silently pre-filtered
    // quality frame would undercount members and could elect a worse keeper
    val partial = qual.filter(col("doc_id") =!= 2L)
    val ex = intercept[Exception] {
      Dedup.keepBestPerComponent(comp, partial).collect()
    }
    assert(ex.getMessage.contains("no quality row"), ex.getMessage)
  }

  test("bigram LM scores match the hand-computed smoothed probabilities") {
    // corpus: unigrams a:3 b:2 c:1 z:1 → V=4; bigrams "a b":2, "a c":1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z")).toDF("doc_id", "text")
    val got = graft.text.LangModel.bigramScore(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double])].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ab = r6(-math.log((2 + 1.0) / (3 + 1.0 * 4)))   // P(b|a) = 3/7
    val ac = r6(-math.log((1 + 1.0) / (3 + 1.0 * 4)))   // P(c|a) = 2/7
    assert(got == Seq(
      (1L, 1L, Some(r6(ab))), (2L, 1L, Some(r6(ab))),
      (3L, 1L, Some(r6(ac))),
      (4L, 0L, None)))   // single-token doc: no bigrams, null score
  }

  test("trigram LM generalizes the same dataflow with hand-checked scores") {
    // contexts (bigram instances): "a b":2, "b c":2, "c a":1, "x y":1;
    // trigrams: "a b c":2, "b c a":1; V = 5 distinct unigrams (a b c x y)
    val docs = Seq((1L, "a b c"), (2L, "a b c a"), (3L, "x y")).toDF("doc_id", "text")
    val got = graft.text.LangModel.ngramScore(docs, col("doc_id"), col("text"), 3)
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val v = 5.0  // distinct unigrams: a b c x y
    val abc = r6(-math.log((2 + 1.0) / (2 + 1.0 * v)))  // C(abc)=2, C(ab)=2
    val bca = r6(-math.log((1 + 1.0) / (2 + 1.0 * v)))  // C(bca)=1, C(bc)=2
    assert(got(0) == ((1L, 1L, Some(r6(abc)))))
    assert(got(1) == ((2L, 2L, Some(r6((abc + bca) / 2.0)))))
    assert(got(2) == ((3L, 0L, None)))  // 2 tokens: no trigrams
  }

  test("persisted LM model scores new batches; unseen text hits the smoothed floor") {
    val L = graft.text.LangModel
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z")).toDF("doc_id", "text")
    val (ng, ctx, voc) = L.trainNgramModel(corpus, col("text"), 2)
    // the model is three plain tables: persist and restore (the daily-sync
    // contract — the archive is never re-counted)
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    ng.write.parquet(s"$dir/ng"); ctx.write.parquet(s"$dir/ctx"); voc.write.parquet(s"$dir/voc")
    val (ngR, ctxR, vocR) = (spark.read.parquet(s"$dir/ng"),
      spark.read.parquet(s"$dir/ctx"), spark.read.parquet(s"$dir/voc"))
    val direct = L.bigramScore(corpus, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().toSeq
    val restored = L.scoreAgainstModel(corpus, col("doc_id"), col("text"), 2, ngR, ctxR, vocR)
      .orderBy("doc_id").collect().toSeq
    assert(restored == direct)
    // a wholly out-of-domain doc: unseen context and ngram count as 0, so
    // P = k/(0 + k*V) = 1/4 at k=1, V=4 -> nll = ln 4 (high = filtered out)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val fresh = L.scoreAgainstModel(Seq((9L, "q r")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 2, ngR, ctxR, vocR)
      .as[(Long, Long, Option[Double])].head()
    assert(fresh == ((9L, 1L, Some(r6(math.log(4.0))))))
  }

  test("perplexity buckets calibrate per slice, not globally") {
    // slice A scores 1..10, slice B scores 101..110: global cuts would put
    // ALL of A in head and ALL of B in tail; per-slice cuts split each
    val rows = (1 to 10).map(i => (i.toLong, "A", Some(i.toDouble))) ++
      (1 to 10).map(i => (100L + i, "B", Some(100.0 + i))) :+
      ((999L, "A", None: Option[Double]))
    val scored = rows.toDF("doc_id", "slice", "score")
    val got = graft.text.LangModel.perplexityBuckets(scored,
        col("doc_id"), col("slice"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // percentile(0.3) over 1..10 = 3.7, percentile(0.7) = 7.3
    for (s <- Seq(0L, 100L)) {
      assert((1 to 3).forall(i => got(s + i) == "head"))
      assert((4 to 7).forall(i => got(s + i) == "middle"))
      assert((8 to 10).forall(i => got(s + i) == "tail"))
    }
    assert(got(999L) == "unscored")
  }

  test("budget fill keeps best-first per slice and reports the cut honestly") {
    val docs = Seq(
      (1L, "A", 40L, 0.5), (2L, "A", 40L, 1.0), (3L, "A", 40L, 0.7), (4L, "A", 40L, 1.0),
      (5L, "B", 90L, 0.2), (6L, "B", 30L, 0.9)
    ).toDF("doc_id", "slice", "n_tok", "q")
    val got = graft.curation.Curation.budgetFill(docs,
        col("doc_id"), col("slice"), col("n_tok"), col("q"), 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    // slice A fills quality-desc, id-asc: 2 (40), 4 (80), 3 (120 over)
    assert(got(2L) == ((40L, true)))
    assert(got(4L) == ((80L, true)))
    assert(got(3L) == ((120L, false)))
    assert(got(1L) == ((160L, false)))
    // slice B: 6 fits, then 5 overshoots — budgets are per slice
    assert(got(6L) == ((30L, true)))
    assert(got(5L) == ((120L, false)))
  }

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "text")
    val got = Dedup.exact(df, col("id"), col("text"))
      .select("n_dups", "keep_id").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 1L), (1L, 3L)))
  }

  test("minhash LSH pairs identical docs and not unrelated ones") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("id", "text")
    val sig = Dedup.minhashSignatures(df, col("id"), col("text"), 3, 16)
    val pairs = Dedup.lshCandidatePairs(sig, 16, 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash is 32 bits and identical for identical docs") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "v w x y z")).toDF("id", "text")
    val got = Dedup.simhash32(df, col("id"), col("text"))
      .select("doc_id", "simhash").as[(Long, String)].collect().toMap
    assert(got.values.forall(h => h.length == 32 && h.forall(c => c == '0' || c == '1')))
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
  }

  test("ngram jaccard is 1.0 for identical docs") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("id", "text")
    val got = Dedup.ngramJaccard(df, col("id"), col("text"), 3, lit(true), 0.5)
      .select("jaccard").as[Double].collect().toSeq
    assert(got == Seq(1.0))
  }

  test("connected components assign min-reachable ids over chained pairs") {
    // chain 1-2-3, pair 7-8, chain 10-11-12-13 (propagation needs >1 round)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("pointer jumping converges a 1000-link chain in O(log diameter) rounds") {
    // diameter 1000: plain min-label propagation needs ~1000 rounds and
    // would throw at any sane cap; the label shortcut doubles reach per
    // round, so log2(1000) ≈ 10 rounds must suffice. maxIters=12 pins the
    // complexity class — an accidental regression to linear propagation
    // fails here instead of silently slowing 100× at corpus scale.
    // localEdgeCap = 0 forces the distributed loop: the size dispatch would
    // otherwise solve this graph on the driver and the complexity-class pin
    // would stop exercising pointer jumping
    val chain = (0L until 1000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, "doc_a", "doc_b", maxIters = 12,
        localEdgeCap = 0)
      .as[(Long, Long)].collect()
    assert(got.length == 1001)
    assert(got.forall(_._2 == 0L), "every chain node must reach the global min label")
  }

  test("ngram frequent-shingle cap suppresses the quadratic bucket, keeps true pairs") {
    // every doc shares one ubiquitous shingle ("of the and"); docs 0/1 also
    // share distinctive content
    val docs = (0 until 100).map { i =>
      val text = if (i <= 1) s"of the and alpha beta gamma delta$i"
                 else s"of the and filler$i more$i stuff$i"
      (i.toLong, text)
    }.toDF("id", "text")
    val uncapped = Dedup.ngramJaccard(docs, col("id"), col("text"), 3, lit(true), 0.0)
    val capped = Dedup.ngramJaccard(docs, col("id"), col("text"), 3, lit(true), 0.0,
      maxShingleFreq = 10L)
    // without the cap, the shared stop-shingle makes every pair a candidate
    assert(uncapped.count() == 100L * 99 / 2)
    val cappedPairs = capped.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // with the cap only the genuinely-overlapping pair survives
    assert(cappedPairs == Set((0L, 1L)))
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "emb")
    val v = Knn.toDoubleArray(col("emb"))
    val got = df.select(round(Knn.cosine(v, v), 9)).as[Double].collect().head
    assert(got == 1.0)
  }

  test("bruteForceTopK ranks the nearest vector first") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val got = Knn.bruteForceTopK(df.filter(col("id") === 1), df, 2)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }

  test("recallAtK: exact-vs-exact is 1.0 and LSH recall stays in bounds") {
    val emb = GraftSession.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val q = emb.filter(col("id") < 8)
    val exact = Knn.bruteForceTopK(q, emb, 10)
    val self = Knn.recallAtK(exact, exact)
    assert(self.filter(col("recall") =!= 1.0).count() == 0)
    val lsh = Knn.recallAtK(exact, Knn.lshTopK(q, emb, 10, 8, 64))
    val bad = lsh.filter(col("recall") < 0 || col("recall") > 1
      || col("n_hit") > col("n_exact")).count()
    assert(bad == 0)
    assert(lsh.count() == 8) // every query reports, even at zero recall
  }

  test("consensusVote: all four agreement shapes resolve as documented") {
    val df = Seq(
      ("u", "x", "x", "x"),  // unanimous -> x, 3
      ("m", "x", "x", "y"),  // a=b majority -> x (a on winning side), 2
      ("o", "x", "y", "y"),  // b=c outvotes a -> y, 2
      ("d", "x", "y", "z"))  // all distinct -> a (the prior), 1
      .toDF("k", "a", "b", "c")
    val out = df.select((col("k") +: graft.text.TextFeatures.consensusVote(
        col("a"), col("b"), col("c"))): _*)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out("u") === ("x", 3))
    assert(out("m") === ("x", 2))
    assert(out("o") === ("y", 2))
    assert(out("d") === ("x", 1))
  }

  test("labelMatchEval: hand-checked NDCG/MRR/precision, lonely-label null ndcg") {
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "A"), (5L, "B"), (6L, "C"))
      .toDF("id", "label")
    // query 1 (label A, R=2): retrieved B, A, A at ranks 1..3
    // query 6 (label C, R=0): nothing relevant exists anywhere
    val ranked = Seq((1L, 3L, 1), (1L, 2L, 2), (1L, 4L, 3),
      (6L, 2L, 1), (6L, 3L, 2), (6L, 5L, 3))
      .toDF("query_id", "vec_id", "rank")
    val out = graft.similarity.RankEval.labelMatchEval(ranked, labels, 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_rel_corpus") === 2 && r1.getAs[Long]("hits") === 2)
    assert(r1.getAs[Double]("precision_at_k") === q6(2.0 / 3.0))
    assert(r1.getAs[Double]("mrr") === 0.5) // first relevant at rank 2
    val dcg = q6(1.0 / (math.log(3.0) / math.log(2.0))) + q6(1.0 / 2.0)
    val idcg = q6(1.0) + q6(1.0 / (math.log(3.0) / math.log(2.0)))
    assert(r1.getAs[Double]("ndcg") === q6(dcg / idcg))
    val r6row = out(6L)
    assert(r6row.getAs[Long]("n_rel_corpus") === 0 && r6row.getAs[Long]("hits") === 0)
    assert(r6row.getAs[Double]("mrr") === 0.0)
    assert(r6row.isNullAt(r6row.fieldIndex("ndcg"))) // nothing to rank, not 0/0
  }

  test("hard negatives exclude near-dups BEFORE ranking, keeping k usable slots") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),     // anchor
      (2L, Array(0.99f, 0.01f)),   // near-dup of anchor (cos ~1): excluded
      (3L, Array(0.98f, 0.02f)),   // near-dup: excluded
      (4L, Array(0.7f, 0.7f)),     // cos ~0.7: the hardest usable negative
      (5L, Array(0.0f, 1.0f)),     // orthogonal
      (6L, Array(-1.0f, 0.0f))     // opposite
    ).toDF("vec_id", "embedding")
      .select(col("vec_id").as("id"), graft.similarity.Knn.toDoubleArray(col("embedding")).as("vec"))
    val got = graft.similarity.Knn.hardNegativeTopK(df.filter(col("id") === 1), df, 2, 0.95)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    // a post-filtered plain top-2 would have returned ONLY dups (2, 3);
    // pre-filter ranking yields two real negatives
    assert(got.map(_._1).toSeq == Seq(4L, 5L))
    assert(got.forall(_._2 < 0.95))
  }

  test("hardNegatives dispatcher: exact path is the small-corpus reference, LSH above the cap") {
    // the exact kernel is corpus-quadratic BY CONTRACT (anchors are
    // corpus-proportional) — the production entry point must route any
    // corpus past HardNegativeExactMaxCorpus to the LSH path (VERDICT r13
    // item 8: the exact row is a labeled reference implementation)
    import graft.similarity.Knn
    val df = (0L until 32L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 31.0 + d).toFloat)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val anchors = df.filter(col("id") % 8 === 0)
    def planOf(x: org.apache.spark.sql.DataFrame) =
      x.queryExecution.optimizedPlan.canonicalized.toString
    // below the cap: the dispatcher IS the exact reference
    val small = Knn.hardNegatives(anchors, df, 3, 0.95, 4, 8, corpusVectors = 32L)
    assert(planOf(small) == planOf(Knn.hardNegativeTopK(anchors, df, 3, 0.95)))
    // above the cap: the dispatcher IS the LSH path
    val big = Knn.hardNegatives(anchors, df, 3, 0.95, 4, 8,
      corpusVectors = Knn.HardNegativeExactMaxCorpus + 1)
    assert(planOf(big) == planOf(Knn.hardNegativeTopKLsh(anchors, df, 3, 0.95, 4, 8)))
    // and the cap itself routes exact (<=, not <)
    val edge = Knn.hardNegatives(anchors, df, 3, 0.95, 4, 8,
      corpusVectors = Knn.HardNegativeExactMaxCorpus)
    assert(planOf(edge) == planOf(small))
  }

  test("media decode is deterministic and preserves byte length") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    val a = graft.multimodal.Media.decodeDocuments(spark, docs).orderBy("media_id").collect().toSeq
    val b = graft.multimodal.Media.decodeDocuments(spark, docs).orderBy("media_id").collect().toSeq
    assert(a == b)
    assert(a.forall(r => r.getLong(1) > 0))
  }

  test("null-text documents decode as empty payloads instead of killing the job") {
    import spark.implicits._
    val docs = Seq((1L, Some("hello")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val meta = graft.multimodal.Media.decodeDocuments(spark, docs)
      .orderBy("media_id").collect()
    assert(meta(1).getLong(1) == 0L && meta(1).getInt(2) == 0) // empty payload metadata
    assert(meta(0).getLong(1) == 5L)
    // the other three processors survive the same row
    assert(graft.multimodal.Media.frameStatsDocuments(spark, docs, 32, 3).count() == 2)
    assert(graft.multimodal.Media.featuresDocuments(spark, docs, 8).count() == 2)
    assert(graft.multimodal.Media.resizeDocuments(spark, docs, 64, 64).count() == 2)
  }

  test("arithmetic frame stats equal the materialized chunking on edge shapes") {
    import graft.multimodal.Media
    def ref(len: Int, frameSize: Int, stride: Int): (Long, Long, Long) = {
      val frames = Array.fill(len)(1.toByte).grouped(frameSize).toArray
      val sampled = frames.indices.collect { case i if i % stride == 0 => frames(i) }
      (frames.length.toLong, sampled.length.toLong, sampled.map(_.length.toLong).sum)
    }
    for {
      len <- Seq(0, 1, 31, 32, 33, 63, 64, 65, 96, 97, 100, 320)
      frameSize <- Seq(1, 3, 32)
      stride <- Seq(1, 2, 3, 7)
    } {
      val got = Media.frameSample(
        Media.MediaRaw(1L, Array.fill(len)(1.toByte), "video/fake"), frameSize, stride)
      val want = ref(len, frameSize, stride)
      assert((got.n_frames_total, got.n_frames_sampled, got.sampled_bytes) == want,
        s"len=$len frameSize=$frameSize stride=$stride")
    }
  }

  test("resize plan preserves aspect ratio and survives zero source dims") {
    import graft.multimodal.Media
    def plan(bytes: Array[Byte]) = Media.resizePlan(Media.MediaRaw(1L, bytes, "image/fake"), 64, 64)
    // 100 bytes -> w=100, h=(cp('x')*7)%480=360: limited by height? w*64 <= h*64 -> 100<=360 yes
    val p = plan(("x" * 100).getBytes("UTF-8"))
    assert(p.src_width == 100 && p.src_height == 360)
    assert(p.dst_height == 64 && p.dst_width == 100 * 64 / 360)
    assert(p.out_bytes == p.dst_width.toLong * p.dst_height * 3)
    // 640 bytes -> w = 640 % 640 = 0: degenerate source must not divide by zero
    val z = plan(("y" * 640).getBytes("UTF-8"))
    assert(z.src_width == 0 && z.dst_width == 0 && z.dst_height == 0 && z.out_bytes == 0L)
  }

  test("int8 quantization preserves cosine and brute-force shortlists") {
    val e = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val deq = e.select(col("id"), Knn.dequantizeInt8(Knn.quantizeInt8(col("vec"))).as("vec"))
    // per-vector fidelity: original vs round-tripped cosine stays ~1
    val worst = e.withColumnRenamed("vec", "v0").join(deq, "id")
      .select(Knn.cosine(col("v0"), col("vec")).as("c"))
      .agg(min(col("c"))).head.getDouble(0)
    assert(worst > 0.999, s"quantization cosine floor $worst")
    // shortlist recall: top-10 over the quantized corpus vs exact
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val q0 = e.filter(col("id") < 8)
    val qq = deq.filter(col("id") < 8)
    val exact = neighbors(Knn.bruteForceTopK(q0, e, 10))
    val quant = neighbors(Knn.bruteForceTopK(qq, deq, 10))
    val recall = (quant intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall")
  }

  test("cosine of a zero vector is null, not a job-killing divide-by-zero") {
    val df = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f))).toDF("id", "emb")
    val v = Knn.toDoubleArray(col("emb"))
    val got = df.select(Knn.cosine(v, v).as("c")).collect().map(r => r.isNullAt(0)).toSeq
    assert(got == Seq(true, false))
  }

  test("band leaves null inputs null instead of assigning the top bucket") {
    val df = Seq(Some(5.0), None).toDF("x")
    val got = df.select(graft.operators.Imputation.band(col("x"), Seq(10.0), Seq("low", "high")).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("low", null))
  }

  test("fingerprint of a too-short doc is null, not empty string") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("id", "text")
    val got = graft.dedup.Dedup.bottomKFingerprint(df, col("id"), col("text"), 3, 4)
      .orderBy("doc_id").collect().map(r => r.isNullAt(1)).toSeq
    assert(got == Seq(true, false))
  }

  test("nearDupPairs keeps sampled-vector pairs regardless of id order") {
    // ids 0 (sampled) and 1 (not), plus 50 (sampled) with a smaller unsampled near-dup 3
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(1.0f, 0.01f), 1),
      (50L, Array(0.0f, 1.0f), 2), (3L, Array(0.01f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Knn.nearDupPairs(df, col("vec_id"), col("embedding"), col("label"),
      col("id") % 50 === 0, 0.9).select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (50L, 3L))) // 50 > 3 but the pair is not lost
  }

  test("ANN recall: LSH and IVF retrieve a meaningful share of brute-force neighbors") {
    val e = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val queries = e.filter(col("id") < 8)
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = neighbors(Knn.bruteForceTopK(queries, e, 10))
    val lsh = neighbors(Knn.lshTopK(queries, e, 10, 3, 64)) // 3 planes: 8 buckets over 500 vecs
    val ivf = neighbors(Knn.ivfTopK(e.filter(col("id") >= 8 && col("id") < 16), e, queries, 10))
    // recall floor: approximate methods must overlap brute force non-trivially
    val lshRecall = (lsh intersect exact).size.toDouble / exact.size
    assert(lshRecall >= 0.05, s"LSH recall $lshRecall")
    assert(lsh.nonEmpty && ivf.nonEmpty)
  }

  test("multi-probe LSH strictly improves on single-bucket recall") {
    val e = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val queries = e.filter(col("id") < 8)
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = neighbors(Knn.bruteForceTopK(queries, e, 10))
    val single = neighbors(Knn.lshTopK(queries, e, 10, 8, 64))
    val multi = neighbors(Knn.lshMultiProbeTopK(queries, e, 10, 8, 64))
    val rSingle = (single intersect exact).size.toDouble / exact.size
    val rMulti = (multi intersect exact).size.toDouble / exact.size
    assert(rMulti > rSingle, s"multi=$rMulti single=$rSingle")
  }

  test("multi-probe IVF improves on single-probe recall against brute force") {
    val e = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val queries = e.filter(col("id") >= 8 && col("id") < 16)
    val cents = e.filter(col("id") < 8)
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = neighbors(Knn.bruteForceTopK(queries, e, 10))
    val single = neighbors(Knn.ivfTopK(queries, e, cents, 10))
    val multi = neighbors(Knn.ivfTopKProbes(queries, e, cents, 10, 3))
    val rSingle = (single intersect exact).size.toDouble / exact.size
    val rMulti = (multi intersect exact).size.toDouble / exact.size
    // probing 3 cells must not lose recall, and single-probe's own bucket is
    // always the first probe -> candidates are a superset
    assert(rMulti >= rSingle, s"multi=$rMulti single=$rSingle")
    assert(multi.size >= single.size)
    assert(rMulti > 0.2, s"multi-probe recall $rMulti")
  }

  test("trained IVF centroids reduce inertia versus the untrained seed set") {
    val e = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
    val seeds = e.filter(col("id") < 8)
    val trained = Knn.kmeansCentroids(e, 8, 2).cache()
    val before = Knn.inertia(e, seeds)
    val after = Knn.inertia(e, trained)
    assert(after < before, s"inertia after=$after before=$before")
    // trained centroids still drive the IVF search end-to-end
    val queries = e.filter(col("id") >= 8 && col("id") < 16)
    assert(Knn.ivfTopK(queries, e, trained, 5).count() > 0)
  }

  test("simhash bucket cap suppresses hot buckets but keeps rare-band pairs") {
    // two near-identical docs (many shared tokens -> tiny hamming) + filler
    // sharing a hot common band
    val base = (1 to 24).map(i => s"tok$i").mkString(" ")
    val near = Seq((1L, base + " endA"), (2L, base + " endB"))
    // filler: long shared vocabulary -> near-identical simhashes -> hot buckets
    val fillerBase = (1 to 30).map(i => s"fill$i").mkString(" ")
    val filler = (10L to 40L).map(i => (i, s"$fillerBase w$i"))
    val df = (near ++ filler).toDF("id", "text")
    val unlimited = graft.dedup.Dedup.simhashPairs(df, col("id"), col("text"), 4, 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val capped = graft.dedup.Dedup.simhashPairs(df, col("id"), col("text"), 4, 8, maxBucketSize = 10L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(unlimited))
    assert(unlimited.contains((1L, 2L)))
    assert(capped.contains((1L, 2L)), "rare-band near-dup pair must survive the cap")
    assert(capped.size < unlimited.size, "hot-bucket pairs must be suppressed")
  }

  test("edit-similarity verify keeps close edits, drops shared-band strangers") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("delta", "delra")),  // one-char edit: sim ~0.98
      (3L, base)                              // exact copy of 1
    ).toDF("doc_id", "text")
    val pairs = Dedup.editSimilarityVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val exact = pairs.find(p => (p._1, p._2) == ((1L, 3L))).get._3
    assert(exact == 1.0)
    assert(pairs.forall(_._3 >= 0.9))
    // a high threshold drops the edited pairs but keeps the exact copy
    val strict = Dedup.editSimilarityVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.toSeq == Seq((1L, 3L)))
  }

  test("signature-agreement Jaccard estimate is exact on copies, bounded in [0,1]") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
    val est = Dedup.minhashJaccardEstimate(docs, col("doc_id"), col("text"), 3, 16, 4)
    val rows = est.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, j) => j >= 0.0 && j <= 1.0 })
    // LSH candidacy requires one full shared band (4 of 16 positions) -> est >= 0.25
    assert(rows.forall(_._3 >= 0.25))
    // estimate agrees in expectation with the exact verified Jaccard: on this
    // corpus every candidate pair's estimate is within estimator noise
    val exact = Dedup.minhashDedupVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val worst = rows.map { case (a, b, j) => math.abs(j - exact((a, b))) }.max
    assert(worst <= 0.35, s"estimate drifted $worst from exact Jaccard (stderr ~0.125 at k=16)")
  }

  test("cross-source leakage counts distinct shared spans per source pair, a<b only") {
    val docs = Seq(
      (1L, "one two three four five six", "srcA"),   // spans at window=4, stride=2
      (2L, "one two three four five six", "srcB"),   // full mirror of 1
      (3L, "three four five six seven eight", "srcC"),// shares the 3..6 span with A/B
      (4L, "nine ten eleven twelve", "srcA")          // unshared
    ).toDF("doc_id", "text", "source")
    val got = graft.curation.Curation.crossSourceLeakage(docs, col("text"), col("source"), 4, 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // doc1/doc2 spans: "one two three four", "three four five six" -> 2 shared
    assert(got(("srcA", "srcB")) == 2L)
    // doc3 shares exactly "three four five six" with both mirrors
    assert(got(("srcA", "srcC")) == 1L)
    assert(got(("srcB", "srcC")) == 1L)
    assert(got.size == 3)
    assert(got.keys.forall { case (a, b) => a < b })
  }

  test("containment catches the excerpt-in-article pair that Jaccard misses") {
    val article = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 21).map(i => s"w$i").mkString(" ")   // 12 words inside the article
    val docs = Seq((1L, article), (2L, excerpt), (3L, "x y z q r s t u v")).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(docs, col("doc_id"), col("text"), 3, lit(true), 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the excerpt's 10 shingles are ALL in the article: containment 1.0 ...
    assert(cont.get((1L, 2L)).contains(1.0), cont.toString)
    // ... while the minhash-LSH path never even surfaces the pair as a
    // CANDIDATE (a subset's per-position min survives with p = |A|/|B|, so
    // a full shared band is vanishingly unlikely) — which is exactly why
    // containment candidates must come from shared shingles
    val lsh = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16), 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!lsh.contains((1L, 2L)), lsh.toString)
    assert(!cont.contains((1L, 3L)) && !cont.contains((2L, 3L)))
  }

  test("incremental dedup equals the cross-split slice of the batch decision") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
    val newB = docs.filter(col("doc_id") % 7 === 0)
    val idx = docs.filter(col("doc_id") % 7 =!= 0)
    val inc = Dedup.incrementalDedupVerified(newB, idx, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the batch decision over the whole corpus, sliced to cross-split pairs
    // and re-oriented (new_doc first), must be exactly the incremental result
    val expected = Dedup.minhashDedupVerified(docs, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        if (a % 7 == 0 && b % 7 != 0) Some((a, b, j))
        else if (b % 7 == 0 && a % 7 != 0) Some((b, a, j))
        else None
      }.toSet
    assert(inc == expected)
    assert(inc.nonEmpty, "split chosen so the gate exercises real cross-split pairs")
  }

  test("simhash64 discriminates better than simhash32 on a low-diversity corpus") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
    val h = docs.select(
      graft.functions.ShingleExpressions.simhash32(col("text")).as("h32"),
      graft.functions.ShingleExpressions.simhash64(col("text")).as("h64"))
    val Array(d32, d64) = h.agg(countDistinct(col("h32")), countDistinct(col("h64")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(d64 >= d32, s"d64=$d64 d32=$d32")
    // 64-bit prefix agrees with the 32-bit hash (same vote semantics)
    assert(h.filter(substring(col("h64"), 1, 32) =!= col("h32")).count() == 0)
  }
}
