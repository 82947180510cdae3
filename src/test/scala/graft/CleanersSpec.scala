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

  test("firstInt survives over-long digit runs under ANSI (cleans to null)") {
    val got = Seq("call 252612345678901", "age 34", "999999999")
      .toDF("t").select(Cleaners.firstInt(col("t"))).as[Option[Int]].collect().toSeq
    // a 15-digit run is not an int answer — null, not a thrown cast
    assert(got == Seq(None, Some(34), Some(999999999)))
  }

  test("cleanAgeLocalized resolves two number words by table order, deterministically") {
    val got = Seq("kumi ama ishirini").toDF("t")
      .select(Cleaners.cleanAgeLocalized(col("t"), Cleaners.swahiliTens))
      .as[Option[Int]].collect().toSeq
    // kumi (10) precedes ishirini (20) in the table -> 10 wins, always
    assert(got == Seq(Some(10)))
  }

  test("redaction: case-insensitive scheme, whitespace-bounded URLs, whole phone runs, reconciled counts") {
    import graft.text.Redact
    val rows = Seq(
      "see HTTPS://EXAMPLE.COM/user@host.org rest",   // uppercase URL owns its @
      "see https://a.com\nCall me",                   // newline ends the URL
      "num +12345678901234567 end",                   // 17 digits mask whole
      "https://x.y/a@b.co?tel=+123456789 and t@u.vw") // email+phone inside URL
      .toDF("text")
    val got = rows.select(Redact.piiColumns(col("text")): _*)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0) == ((1L, 0L, 0L, "see <URL> rest")), got(0).toString)
    assert(got(1) == ((1L, 0L, 0L, "see <URL>\nCall me")), got(1).toString)
    assert(got(2) == ((0L, 0L, 1L, "num <PHONE> end")), got(2).toString)
    // counts reconcile with the placeholders: the in-URL email/phone are
    // attributed to the URL, the free-standing email still counts
    assert(got(3) == ((1L, 1L, 0L, "<URL> and <EMAIL>")), got(3).toString)
  }
}
