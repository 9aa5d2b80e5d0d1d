package graft.operators

import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): (String, Long, Long, Long, Long) =
    Redact.redactPii(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select("clean", "n_email", "n_ssn", "n_phone", "n_ip")
      .as[(String, Long, Long, Long, Long)].collect().head

  test("each category redacts to its token and counts on the original text") {
    val (clean, e, s, p, i) =
      run("mail a.b+c@test.org or x@y.io, ssn 123-45-6789, call 312-555-0100 or 312.555.0100, host 10.0.0.1")
    assert(clean ==
      "mail <EMAIL> or <EMAIL>, ssn <SSN>, call <PHONE> or <PHONE>, host <IP>")
    assert((e, s, p, i) == ((2L, 1L, 2L, 1L)))
  }

  test("shape boundaries: SSN and phone digit groupings never cross-match") {
    // 3-3-4 is a phone, never an SSN; 3-2-4 is an SSN, never a phone
    assert(run("312-555-0100") == (("<PHONE>", 0L, 0L, 1L, 0L)))
    assert(run("123-45-6789") == (("<SSN>", 0L, 1L, 0L, 0L)))
    // digit runs inside longer numbers don't match (word boundaries)
    assert(run("9123-45-67890")._3 == 0L)
    // three dotted groups are not an IP
    assert(run("ver 1.2.3 ok") == (("ver 1.2.3 ok", 0L, 0L, 0L, 0L)))
  }

  test("clean text is untouched and all counts are zero") {
    assert(run("the quick brown fox at noon") ==
      (("the quick brown fox at noon", 0L, 0L, 0L, 0L)))
  }

  test("an IP-hosted address is an IP hit, not an email (email needs an alpha TLD)") {
    val (clean, e, _, _, i) = run("ping admin@10.0.0.1 now")
    assert(clean == "ping admin@<IP> now")
    assert(e == 0L && i == 1L)
  }
}
