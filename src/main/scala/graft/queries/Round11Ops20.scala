package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 20: code-vs-prose detection (the curation gate that
  * routes source files and prose to different pipelines / mix buckets)
  * and a Benford first-digit audit (the classic "is this numeric
  * column organic or synthetic/fabricated?" data-quality check).
  *
  * Scale shapes: code detection is per-doc integer rule arithmetic
  * (the q_quality_gopher shape — one projection, one combinable
  * per-source combine); Benford is one first-digit count combine and
  * a 9-row readout — every ln runs through LnIeee, χ² folds its 9
  * terms sorted by digit.
  */
object Round11Ops20 {

  val defs: Seq[QueryDef] = Seq(

    // Code-likeness battery: three integer rules on each doc —
    // symbol-heavy (4·symbols > chars), bracket density (8+ brackets
    // per 100 chars), low vowel share (5·vowels < chars, code
    // identifiers are vowel-poor) — a doc flagged on ≥ 2 of 3 counts
    // as code. Per source: doc count, per-rule hit counts, code count.
    // Every rule is a BIGINT cross-multiplication — no float ratios
    // anywhere (the q_quality_gopher discipline).
    QueryDef("q_quality_code_detect",
      (s, d) => {
        val chars = length(col("text")).cast("long")
        val symbols = (length(col("text"))
          - length(regexp_replace(col("text"), "[{}()\\[\\];=<>+*/&|^%#@!~`\\\\-]", "")))
          .cast("long")
        val brackets = (length(col("text"))
          - length(regexp_replace(col("text"), "[{}()\\[\\]]", ""))).cast("long")
        val vowels = (length(col("text"))
          - length(regexp_replace(lower(col("text")), "[aeiou]", ""))).cast("long")
        Tables.documents(s, d)
          .select(col("source"), chars.as("c"), symbols.as("sy"),
            brackets.as("br"), vowels.as("vo"))
          .filter(col("c") > 0)
          .select(col("source"),
            (lit(4) * col("sy") > col("c")).cast("long").as("r_sym"),
            (lit(100) * col("br") >= lit(8) * col("c")).cast("long").as("r_br"),
            (lit(5) * col("vo") < col("c")).cast("long").as("r_vow"))
          .withColumn("is_code",
            ((col("r_sym") + col("r_br") + col("r_vow")) >= 2).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("r_sym").cast("long").as("hits_symbols"),
            sum("r_br").cast("long").as("hits_brackets"),
            sum("r_vow").cast("long").as("hits_vowels"),
            sum("is_code").cast("long").as("n_code"))
          .orderBy("source")
      },
      """WITH scored AS (
        |  SELECT source, length(text)::BIGINT AS c,
        |    (length(text) - length(regexp_replace(text,
        |      '[{}()\[\];=<>+*/&|^%#@!~`\\-]', '', 'g')))::BIGINT AS sy,
        |    (length(text) - length(regexp_replace(text,
        |      '[{}()\[\]]', '', 'g')))::BIGINT AS br,
        |    (length(text) - length(regexp_replace(lower(text),
        |      '[aeiou]', '', 'g')))::BIGINT AS vo
        |  FROM documents),
        |rules AS (
        |  SELECT source,
        |    (4 * sy > c)::BIGINT AS r_sym,
        |    (100 * br >= 8 * c)::BIGINT AS r_br,
        |    (5 * vo < c)::BIGINT AS r_vow
        |  FROM scored WHERE c > 0)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(r_sym)::BIGINT AS hits_symbols,
        |  sum(r_br)::BIGINT AS hits_brackets,
        |  sum(r_vow)::BIGINT AS hits_vowels,
        |  sum((r_sym + r_br + r_vow >= 2)::BIGINT)::BIGINT AS n_code
        |FROM rules GROUP BY source
        |ORDER BY source""".stripMargin),

    // Benford first-digit audit of o_totalprice: observed counts vs the
    // Benford expectation p_d = ln(1+1/d)/ln(10), per-digit χ² terms,
    // and a `__chi2__` summary row folding the 9 terms sorted by digit.
    // ln via LnIeee on the exact rational (d+1)/d, so expectations are
    // bit-identical on both engines.
    QueryDef("q_stats_benford",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        def ln(c: org.apache.spark.sql.Column) = call_function("ln_ieee", c)
        val digits = Tables.orders(s, d)
          .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
            1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).cast("long").as("obs"))
        val tot = digits.agg(sum("obs").cast("long").as("n"))
        val terms = digits.crossJoin(broadcast(tot))
          .select(col("digit"), col("obs"), col("n"),
            (ln((col("digit") + lit(1)).cast("double") / col("digit").cast("double"))
              / ln(lit(10.0))).as("p_benford"))
          .withColumn("expected", col("n").cast("double") * col("p_benford"))
          .withColumn("chi2_term",
            (col("obs").cast("double") - col("expected"))
              * (col("obs").cast("double") - col("expected")) / col("expected"))
        val summary = terms
          .groupBy(lit(1))
          .agg(sum("obs").cast("long").as("obs"),
            array_sort(collect_list(struct(col("digit"), col("chi2_term"))))
              .as("ts"))
          .select(lit(0L).as("digit"), col("obs"), lit(0.0).as("p_benford"),
            lit(0.0).as("expected"),
            aggregate(transform(col("ts"), e => e.getField("chi2_term")),
              lit(0.0), (acc, x) => acc + x).as("chi2_term"))
        terms.select("digit", "obs", "p_benford", "expected", "chi2_term")
          .unionAll(summary)
          .orderBy("digit")
      },
      """WITH digits AS (
        |  SELECT substring(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::BIGINT
        |      AS digit,
        |    count(*)::BIGINT AS obs
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT sum(obs)::BIGINT AS n FROM digits),
        |terms AS (
        |  SELECT digit, obs, n,
        |    ln((digit + 1)::DOUBLE / digit::DOUBLE) / ln(10.0::DOUBLE)
        |      AS p_benford,
        |    n::DOUBLE * (ln((digit + 1)::DOUBLE / digit::DOUBLE)
        |      / ln(10.0::DOUBLE)) AS expected
        |  FROM digits, tot),
        |withchi AS (
        |  SELECT digit, obs, p_benford, expected,
        |    (obs::DOUBLE - expected) * (obs::DOUBLE - expected) / expected
        |      AS chi2_term
        |  FROM terms),
        |summary AS (
        |  SELECT 0::BIGINT AS digit, sum(obs)::BIGINT AS obs,
        |    0.0 AS p_benford, 0.0 AS expected,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(digit := digit, t := chi2_term))),
        |      e -> struct_extract(e, 't'))), (x, y) -> x + y) AS chi2_term
        |  FROM withchi)
        |SELECT digit, obs, p_benford, expected, chi2_term FROM withchi
        |UNION ALL SELECT digit, obs, p_benford, expected, chi2_term FROM summary
        |ORDER BY digit""".stripMargin),
  )
}
