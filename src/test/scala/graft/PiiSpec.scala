package graft

import graft.ops.TextAnalysis

/** PII redaction: pattern coverage, ordering (emails before phones so the
  * digit patterns can't chew up an address's local part), and the no-op
  * guarantee on clean text.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def redact(texts: String*): Seq[(String, Long)] = {
    texts.toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("red"),
        TextAnalysis.piiMatchCount(col("text")).as("n"))
      .as[(String, Long)].collect().toSeq
  }

  test("emails, phones, and IPv4s are redacted") {
    val got = redact(
      "contact me at jane.doe+spam@example.co.uk for details",
      "call +1 (555) 123-4567 or 555-987-6543 tomorrow",
      "server at 192.168.10.1 timed out")
    assert(got(0) == ("contact me at <EMAIL> for details", 1L))
    assert(got(1) == ("call <PHONE> or <PHONE> tomorrow", 2L))
    assert(got(2) == ("server at <IP> timed out", 1L))
  }

  test("mixed PII in one document, all classes scrubbed") {
    val Seq((red, n)) = redact(
      "mail a@b.io, dial 555-123-4567, ping 10.0.0.2")
    assert(red == "mail <EMAIL>, dial <PHONE>, ping <IP>")
    assert(n == 3L)
  }

  test("clean text passes through byte-identical with zero matches") {
    val clean = "the quick brown fox has no identifying information 42"
    val Seq((red, n)) = redact(clean)
    assert(red == clean)
    assert(n == 0L)
  }

  test("email is not half-eaten by the phone pattern") {
    // digits-heavy local part: if phones ran first they could match
    // inside the address and break it apart. One entity scrubbed means
    // a count of exactly 1 — the count runs on the progressively
    // redacted text, so the phone pattern never sees the digits the
    // email redaction already consumed
    val Seq((red, n)) = redact("reach 555.123.4567x@corp.example.com now")
    assert(red == "reach <EMAIL> now", s"got: $red")
    assert(n == 1L)
  }
}
