package graft

import org.apache.spark.sql.functions._

import graft.curation.Curation
import graft.similarity.Knn
import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // The Sennrich toy example: {"low":5, "lower":2, "newest":6, "widest":3}.
  // Merge 1: (e,s) occurs 6+3=9 times — the published first merge.
  private val toy = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainLocal reproduces the published toy merges in order") {
    val merges = Bpe.trainLocal(toy, 4)
    // (e,s)=9 beats (s,t)=9 on the lexicographic tie-break; then (es,t)=9;
    // then (l,o)=7 beats (o,w)=7 (note (w,est) is only 6 — widest merged
    // to w,i,d,est); then (lo,w)=7 — the published example's es/est/lo/low
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("trainLocal stops when no pair repeats, and is deterministic") {
    // one word seen once: every pair count is 1 -> nothing to merge
    assert(Bpe.trainLocal(Seq(("abc", 1L)), 10).isEmpty)
    val a = Bpe.trainLocal(toy, 10)
    val b = Bpe.trainLocal(toy.reverse, 10) // input order must not matter
    assert(a == b)
  }

  test("encodeWord replays training: every trained word type encodes to its merged form") {
    val merges = Bpe.trainLocal(toy, 10)
    val rank = merges.zipWithIndex.toMap
    // after enough merges each frequent word collapses to few pieces, and
    // concatenating the pieces always reproduces the word
    for ((w, _) <- toy) {
      val pieces = Bpe.encodeWord(w, rank)
      assert(pieces.mkString == w, s"round-trip failed for $w")
    }
    // an unseen word still encodes (to whatever merged fragments apply)
    assert(Bpe.encodeWord("lowest", rank).mkString == "lowest")
    assert(Bpe.encodeWord("x", rank).toSeq == Seq("x"))
    assert(Bpe.encodeWord("", rank).toSeq == Seq())
  }

  test("initialPairCounts matches the local loop's first-iteration statistics") {
    val wf = toy.toDF("word", "freq")
    val got = Bpe.initialPairCounts(wf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got(("e", "s")) == 9L)   // newest 6 + widest 3
    assert(got(("l", "o")) == 7L)   // low 5 + lower 2
    assert(got(("w", "e")) == 8L)   // lower 2 + newest 6
    // single-char words contribute nothing
    val one = Bpe.initialPairCounts(Seq(("a", 5L)).toDF("word", "freq"))
    assert(one.count() == 0)
  }

  test("corpus-trained encode round-trips and compresses") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.train(docs, col("text"), 40, 100000)
    assert(merges.size == 40) // word-soup corpus has plenty of repeated pairs
    val stats = Bpe.encodeStats(docs, col("doc_id"), col("text"), merges)
    val bad = stats.filter(col("n_pieces") < col("n_words")).count()
    assert(bad == 0, "a word cannot encode to fewer than one piece")
    // merges must actually compress: pieces < raw characters
    val enc = Bpe.encode(docs, col("doc_id"), col("text"), merges)
    val nPieces = enc.count()
    val nChars = docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .as[Long].head()
    assert(nPieces < nChars, s"no compression: $nPieces pieces vs $nChars chars")
    // piece concatenation per doc reproduces the doc's words (sort INSIDE
    // the aggregate — collect_list order does not survive the shuffle)
    val joined = enc.groupBy("doc_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        s => s.getField("piece"))).as("re"))
    val orig = docs.select(col("doc_id"),
      regexp_replace(col("text"), " ", "").as("flat"))
    val mism = joined.join(orig, "doc_id").filter(col("re") =!= col("flat")).count()
    assert(mism == 0)
  }

  test("persisted merge table round-trips and encodes identically (train offline, apply online)") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.train(docs, col("text"), 30, 100000)
    val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    Bpe.mergesDf(spark, merges).write.mode("overwrite").parquet(dir)
    // a later job reloads the persisted artifact and must encode bit-identically
    val reloaded = spark.read.parquet(dir)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(reloaded == merges)
    val a = Bpe.encodeStats(docs, col("doc_id"), col("text"), merges)
    val b = Bpe.encodeStats(docs, col("doc_id"), col("text"), reloaded)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("datasetSplit is exhaustive, disjoint, and growth-stable") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val s1 = Curation.datasetSplit(docs, col("doc_id"), 90, 5)
    assert(s1.count() == docs.count())
    assert(s1.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // growth stability: the same doc keeps its split in a larger corpus
    val s2 = Curation.datasetSplit(docs.limit(100), col("doc_id"), 90, 5)
    val moved = s2.as("a").join(s1.as("b"), "doc_id")
      .filter(col("a.split") =!= col("b.split")).count()
    assert(moved == 0)
  }

  test("shuffleOrder is a per-shard dense permutation, salt-sensitive") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val o1 = Curation.shuffleOrder(docs, col("doc_id"), "epoch0", 8)
    // positions are dense 1..n within each shard
    val badPos = o1.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
      .count()
    assert(badPos == 0)
    // a different salt produces a genuinely different order
    val o2 = Curation.shuffleOrder(docs, col("doc_id"), "epoch1", 8)
    val same = o1.join(o2, Seq("doc_id", "shard", "pos")).count()
    assert(same < docs.count() / 2, s"epoch salt barely reshuffled: $same unchanged")
  }

  test("contaminationScore agrees with decontaminate's verdict and bounds the fraction") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val score = Curation.contaminationScore(corpus, bench, col("doc_id"), col("text"), 3)
    val verdict = Curation.decontaminate(corpus, bench, col("doc_id"), col("text"), 3)
    val joined = score.join(verdict.select(col("doc_id"), col("contaminated")), "doc_id")
    assert(joined.filter(col("contamination") < 0 || col("contamination") > 1).count() == 0)
    assert(joined.filter((col("contamination") > 0) =!= col("contaminated")).count() == 0)
    assert(joined.filter(col("n_overlap") > col("n_shingles")).count() == 0)
  }

  test("dimStats matches a driver-side exact computation") {
    val emb = GraftSession.table(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Knn.dimStats(emb, col("embedding"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(5)))).toMap
    val vecs = emb.select(col("embedding")).as[Seq[Float]].collect()
    val dims = vecs.head.size
    assert(got.size == dims)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    for (d <- Seq(0, dims / 2, dims - 1)) {
      val xs = vecs.map(v => r6(v(d).toDouble))
      val sum = BigDecimal(xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toString)
      val (n, mean, mx) = got(d)
      assert(n == xs.size)
      assert(mean == r6((sum / xs.size).toDouble), s"dim $d mean")
      assert(mx == xs.max, s"dim $d max")
    }
  }
}
