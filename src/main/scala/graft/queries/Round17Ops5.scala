package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-17 batch 5: PII detection + redaction — the scrubbing pass
  * every training-data pipeline runs before text reaches a tokenizer
  * (emails, phone numbers, IP addresses stripped or replaced with
  * typed placeholders).
  *
  * The synthetic `documents` corpus carries no organic PII, so the
  * query CONSTRUCTS a deterministic PII-bearing text per document
  * (appending `doc_id`-derived email/IP/phone fragments with
  * per-document multiplicities — doc_id % 3 emails, % 2 IPs, % 4
  * phones) and then detects + redacts them with the same patterns in
  * both engines; the gate hashes the per-document counts AND the
  * fully-redacted text, so a single divergent replacement anywhere in
  * the corpus fails the hash. Patterns are deliberately restricted to
  * the regex intersection both engines implement identically
  * (character classes, bounded quantifiers, non-capturing groups — no
  * lookaround, which RE2/DuckDB lacks).
  *
  * Redaction order matters and is part of the contract: emails first
  * (their domains contain dots that the IP pattern must never see),
  * then IPs, then phones.
  *
  * 100 TB story: embarrassingly parallel — a codegen'd
  * regexp_replace/extract_all projection with NO shuffle for the
  * row-level pass; the per-source stats roll up with one partial-agg
  * groupBy on the low-cardinality source key. This is the shape the
  * whole scrubbing family should keep at any scale: never a UDF,
  * never a collect, nothing keyed on document content.
  */
object Round17Ops5 {

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpPat = "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val PhonePat = "\\+[0-9]{6,}"

  /** The deterministic PII-bearing text: SQL fragment shared (modulo
    * dialect) by the Spark expr and the DuckDB oracle. */
  private def piiTextSpark = expr(
    """concat(text,
      |  repeat(concat(' user', doc_id, '@ex.org'), CAST(doc_id % 3 AS INT)),
      |  repeat(concat(' 10.', doc_id % 256, '.0.', (doc_id * 7) % 256),
      |         CAST(doc_id % 2 AS INT)),
      |  repeat(concat(' +1555', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')),
      |         CAST(doc_id % 4 AS INT)))""".stripMargin)

  private val piiTextSql =
    """text ||
      |  repeat(' user' || doc_id::VARCHAR || '@ex.org', (doc_id % 3)::INT) ||
      |  repeat(' 10.' || (doc_id % 256)::VARCHAR || '.0.' ||
      |         ((doc_id * 7) % 256)::VARCHAR, (doc_id % 2)::INT) ||
      |  repeat(' +1555' || lpad((doc_id % 10000)::VARCHAR, 4, '0'),
      |         (doc_id % 4)::INT)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_text_pii_redact",
      (s, d) => {
        val pii = piiTextSpark.as("pii")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), pii)
          .select(
            col("doc_id"), col("source"),
            size(regexp_extract_all(col("pii"), lit(EmailPat), lit(0)))
              .cast("long").as("n_email"),
            size(regexp_extract_all(col("pii"), lit(IpPat), lit(0)))
              .cast("long").as("n_ip"),
            size(regexp_extract_all(col("pii"), lit(PhonePat), lit(0)))
              .cast("long").as("n_phone"),
            regexp_replace(
              regexp_replace(
                regexp_replace(col("pii"), EmailPat, "<EMAIL>"),
                IpPat, "<IP>"),
              PhonePat, "<PHONE>").as("red"))
          .withColumn("red_len", length(col("red")).cast("long"))
          .orderBy("doc_id")
      },
      s"""SELECT doc_id, source,
         |  len(regexp_extract_all(pii, '$EmailPat'))::BIGINT AS n_email,
         |  len(regexp_extract_all(pii, '$IpPat'))::BIGINT AS n_ip,
         |  len(regexp_extract_all(pii, '$PhonePat'))::BIGINT AS n_phone,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(pii, '$EmailPat', '<EMAIL>', 'g'),
         |      '$IpPat', '<IP>', 'g'),
         |    '$PhonePat', '<PHONE>', 'g') AS red,
         |  length(regexp_replace(
         |    regexp_replace(
         |      regexp_replace(pii, '$EmailPat', '<EMAIL>', 'g'),
         |      '$IpPat', '<IP>', 'g'),
         |    '$PhonePat', '<PHONE>', 'g'))::BIGINT AS red_len
         |FROM (SELECT doc_id, source, $piiTextSql AS pii FROM documents) t
         |ORDER BY doc_id""".stripMargin),

    // Per-source scrubbing readout — the curation dashboard row: how
    // much PII does each source carry, and what share of its documents
    // need scrubbing at all (the gate a source-level filter keys on).
    QueryDef("q_text_pii_stats",
      (s, d) => {
        val pii = piiTextSpark.as("pii")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), pii)
          .select(
            col("source"),
            size(regexp_extract_all(col("pii"), lit(EmailPat), lit(0)))
              .cast("long").as("n_email"),
            size(regexp_extract_all(col("pii"), lit(IpPat), lit(0)))
              .cast("long").as("n_ip"),
            size(regexp_extract_all(col("pii"), lit(PhonePat), lit(0)))
              .cast("long").as("n_phone"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_email")).as("emails"),
            sum(col("n_ip")).as("ips"),
            sum(col("n_phone")).as("phones"),
            sum(when(col("n_email") + col("n_ip") + col("n_phone") > 0, 1L)
              .otherwise(0L)).as("docs_with_pii"))
          .withColumn("pii_rate",
            col("docs_with_pii").cast("double") / col("n_docs"))
          .orderBy("source")
      },
      s"""SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_email)::BIGINT AS emails,
         |  sum(n_ip)::BIGINT AS ips,
         |  sum(n_phone)::BIGINT AS phones,
         |  sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0 END)::BIGINT
         |    AS docs_with_pii,
         |  sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*) AS pii_rate
         |FROM (
         |  SELECT source,
         |    len(regexp_extract_all(pii, '$EmailPat'))::BIGINT AS n_email,
         |    len(regexp_extract_all(pii, '$IpPat'))::BIGINT AS n_ip,
         |    len(regexp_extract_all(pii, '$PhonePat'))::BIGINT AS n_phone
         |  FROM (SELECT doc_id, source, $piiTextSql AS pii FROM documents) t
         |) u GROUP BY source ORDER BY source""".stripMargin))
}
