package graft

import org.apache.spark.sql.functions._

import graft.text.Redact

/** Unit coverage of the PII-redaction rules (battery q66 pins the
  * rewrite against the DuckDB oracle byte-for-byte). */
class RedactSpec extends SparkTestBase {
  import spark.implicits._

  private def redactOne(s: String, rules: Seq[(String, String)] = Redact.DefaultRules): String =
    Seq(s).toDF("t").select(Redact.redact(col("t"), rules).as("r")).as[String].head()

  test("default rules scrub email, phone, and digit runs") {
    assert(redactOne("mail bob@example.com or call 555-123-4567 ref 99812") ==
      "mail [EMAIL] or call [PHONE] ref [NUM]")
  }

  test("rule order: phone matches before the digit-run catch-all") {
    assert(redactOne("555-123-4567") == "[PHONE]")
    // catch-all first would eat the phone's digit groups
    assert(redactOne("555-123-4567",
      Seq(Redact.DigitRunPattern -> "[NUM]", Redact.PhonePattern -> "[PHONE]")) ==
      "[NUM]-[NUM]-[NUM]")
  }

  test("short digit runs and text without PII pass through unchanged") {
    assert(redactOne("at 12 o clock on floor 42") == "at 12 o clock on floor 42")
  }

  test("hits counts every occurrence") {
    val n = Seq("call 555-123-4567 or 555-999-0000 now").toDF("t")
      .select(Redact.hits(col("t"), Redact.PhonePattern).as("n")).as[Long].head()
    assert(n == 2L)
  }

  test("property: redacted text matches no rule pattern, and redact is idempotent") {
    import org.scalacheck.{Gen, Prop}
    val piece = Gen.oneOf(
      Gen.alphaStr.map(_.take(8)), Gen.numStr.map(_.take(6)),
      Gen.const("a@b.co"), Gen.const("555-123-4567"), Gen.const(" "), Gen.const("-"))
    val textGen = Gen.listOfN(8, piece).map(_.mkString)
    ScalaCheckSupport.checkProp(Prop.forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = texts.toDF("t")
      val once = df.select(Redact.redact(col("t")).as("r"))
      val counts = once.select(
        (Redact.hits(col("r"), Redact.EmailPattern) +
          Redact.hits(col("r"), Redact.PhonePattern) +
          Redact.hits(col("r"), Redact.DigitRunPattern)).as("n")).as[Long].collect()
      val twice = once.select(Redact.redact(col("r")).as("r2")).as[String].collect()
      val onceVals = once.as[String].collect()
      counts.forall(_ == 0L) && twice.sameElements(onceVals)
    }, minSuccessful = 20)
  }
}
