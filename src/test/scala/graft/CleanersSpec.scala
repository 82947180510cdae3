package graft

import org.apache.spark.sql.functions._

import graft.text.Cleaners

class CleanersSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText lowers, trims, collapses whitespace") {
    val got = Seq("  Hello   World  ").toDF("t")
      .select(Cleaners.normalizeText(col("t"))).as[String].collect().head
    assert(got == "hello world")
  }

  test("digitsOnly strips everything but digits") {
    val got = Seq("+254 (0) 712-345 678").toDF("t")
      .select(Cleaners.digitsOnly(col("t"))).as[String].collect().head
    assert(got == "2540712345678")
  }

  test("cleanAge extracts bounded integers and rejects the rest") {
    val got = Seq("I am 25 years old", "age: 7", "old 120", "none").toDF("t")
      .select(Cleaners.cleanAge(col("t"))).as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(25), None, None, None))
  }

  test("cleanYesNo canonicalizes variants") {
    val got = Seq(" YES ", "nope", "maybe").toDF("t")
      .select(Cleaners.cleanYesNo(col("t"))).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("yes"), Some("no"), None))
  }

  test("cleanAgeLocalized understands Somali and Swahili tens words") {
    val got = Seq("waxaan ahay labaatan jir", "nina miaka thelathini", "I am 45", "no age here")
      .toDF("t")
      .select(Cleaners.cleanAgeLocalized(col("t"),
        Cleaners.somaliTens ++ Cleaners.swahiliTens)).as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(20), Some(30), Some(45), None))
  }
}
