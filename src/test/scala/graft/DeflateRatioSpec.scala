package graft

import org.apache.spark.sql.functions._

/** Pins the deflate-ratio quality signal: repetition compresses far below
  * prose, noise exceeds prose, determinism across codegen/interpreted/SQL
  * paths, and the empty/null contract. Spec-pinned (no SQL oracle can
  * exist for zlib), like the BPE merge loop.
  */
class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(s: String): Double =
    Seq(s).toDF("t")
      .select(graft.functions.DeflateRatio.deflateRatio(col("t")).as("r"))
      .collect().head.getDouble(0)

  test("repetition << prose < noise, and the signal is scale-stable") {
    val spam = "buy now " * 200
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders along the river bank looking for interesting things to eat ") * 10
    val rng = new scala.util.Random(7)
    val noise = Array.fill(1600)((rng.nextInt(94) + 33).toChar).mkString
    val (rs, rp, rn) = (ratio(spam), ratio(prose), ratio(noise))
    assert(rs < 0.05, s"spam ratio $rs")
    assert(rp > rs * 4 && rp < 0.8, s"prose ratio $rp")
    assert(rn > rp, s"noise $rn should exceed prose $rp")
    // doubling pure repetition must NOT double the ratio (structural, not length)
    assert(ratio("buy now " * 400) <= rs * 1.1)
  }

  test("SQL path agrees; empty and null report null") {
    val viaSql = spark.sql("SELECT deflate_ratio('abcabcabcabcabcabc') AS r")
      .collect().head.getDouble(0)
    assert(viaSql === ratio("abcabcabcabcabcabc"))
    val edge = Seq(Some(""), None).toDF("t")
      .select(graft.functions.DeflateRatio.deflateRatio(col("t")).as("r")).collect()
    assert(edge.forall(_.isNullAt(0)))
  }
}
