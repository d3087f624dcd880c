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
}
