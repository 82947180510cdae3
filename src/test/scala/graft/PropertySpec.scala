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

  test("TokenCount expression equals regex token count on generated text") {
    val token = Gen.oneOf(word, Gen.const("!!"), Gen.const("42"), Gen.const("a1b2"))
    val texts = samples(Gen.listOf(token).map(_.mkString(" ")), 120)
    val df = texts.toDF("t")
    val mism = df.select(tokenCount(col("t")).as("a"), TextFeatures.regexTokenCount(col("t")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mism == 0)
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
}
