package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII redaction — the pre-training hygiene pass that scrubs contact
  * and identity strings from document text before it can reach a
  * training corpus (the reference pipeline has no document notion —
  * this extends the SURVEY §2.8 text surface the way t01–t12 do).
  *
  * Patterns are a deliberately conservative, engine-portable subset:
  * plain character classes and bounded quantifiers only — no
  * backreferences, no lookaround — so Java regex (Spark) and RE2
  * (DuckDB, and most scale-out regex engines) match byte-for-byte and
  * the oracle can replicate the operator exactly. Production would
  * extend the pattern set, not the mechanism.
  *
  * Semantics: counts are measured on the ORIGINAL text per category
  * (a string matching two categories counts in both); the redacted
  * text applies the replacements as one fixed chain (email → SSN →
  * phone → IPv4), each category's matches replaced with its
  * `<TOKEN>`. The chain order is part of the contract — both engines
  * run the same chain, so overlap resolution is deterministic.
  *
  * Scale shape: a pure per-row projection — no shuffle, no join, no
  * state; it pipelines inside whatever scan feeds it, so the cost at
  * 100 TB is the regex scan itself, once per document.
  */
object Redact {

  /** RFC-ish email addresses: local@domain.tld. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** US SSN shape 3-2-4; \b keeps digit runs inside longer numbers out. */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  /** US phone shape 3-3-4 with - or . separators. */
  val PhoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  /** Dotted-quad IPv4 (shape only — 999.0.0.1 matches; redaction favors
    * recall over address validity). */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The (pattern, replacement token) chain, in application order. */
  val Chain: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    SsnRe -> "<SSN>",
    PhoneRe -> "<PHONE>",
    Ipv4Re -> "<IP>")

  /** (id, clean, n_email, n_ssn, n_phone, n_ip): the redacted text and
    * per-category match counts from the original text. */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val clean = Chain.foldLeft(col(textCol)) { case (c, (re, token)) =>
      regexp_replace(c, re, token)
    }
    def n(re: String) = size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast("long")
    docs.select(
      col(idCol),
      clean.as("clean"),
      n(EmailRe).as("n_email"),
      n(SsnRe).as("n_ssn"),
      n(PhoneRe).as("n_phone"),
      n(Ipv4Re).as("n_ip"))
  }
}
