package graft

import org.apache.spark.sql.functions._

/** Round-17 pins for the PII scrubbing pass (q_text_pii_redact):
  *   1. redaction is COMPLETE — after the three replacement passes the
  *      redacted text contains zero residual matches of any pattern
  *      (the property a compliance scrub is graded on);
  *   2. detection counts equal the constructed multiplicities
  *      (doc_id % 3 emails, % 2 IPs, % 4 phones) — the synthetic base
  *      text contributes no accidental matches, so a count mismatch
  *      means a pattern drifted;
  *   3. the placeholders actually landed (every doc with PII carries
  *      the typed markers).
  */
class Round17Spec6 extends SparkSpec {

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpPat = "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val PhonePat = "\\+[0-9]{6,}"

  test("pii redaction: complete, counts exact, placeholders present") {
    val df = SparkEntry.queries("q_text_pii_redact")(spark, sf)
      .localCheckpoint(eager = true)

    val residual = df.filter(
      size(regexp_extract_all(col("red"), lit(EmailPat), lit(0))) > 0 ||
      size(regexp_extract_all(col("red"), lit(IpPat), lit(0))) > 0 ||
      size(regexp_extract_all(col("red"), lit(PhonePat), lit(0))) > 0).count()
    assert(residual == 0, s"$residual docs still match a PII pattern after redaction")

    val wrong = df.filter(
      col("n_email") =!= col("doc_id") % 3 ||
      col("n_ip") =!= col("doc_id") % 2 ||
      col("n_phone") =!= col("doc_id") % 4).count()
    assert(wrong == 0, s"$wrong docs have counts diverging from the construction")

    val missing = df.filter(col("n_email") > 0 && !col("red").contains("<EMAIL>"))
      .unionByName(df.filter(col("n_ip") > 0 && !col("red").contains("<IP>")))
      .unionByName(df.filter(col("n_phone") > 0 && !col("red").contains("<PHONE>")))
      .count()
    assert(missing == 0, s"$missing docs lost their typed placeholder")
  }
}
