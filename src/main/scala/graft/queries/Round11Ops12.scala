package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sharded

/** Round-11 batch 12: empirical entropy rate of the user-journey
  * Markov chain, and a difficulty-ordered curriculum schedule — an
  * information-theoretic readout over the transition matrix the
  * events family already builds, and the training-order primitive
  * that turns difficulty scores into an actual schedule.
  */
object Round11Ops12 {

  val defs: Seq[QueryDef] = Seq(

    // Empirical entropy rate of the event-type transition chain:
    // per-state H_i = −Σ_j p_ij·ln p_ij with p_ij = c_ij/c_i, and the
    // overall rate Σ_i w_i·H_i with empirical weights w_i = c_i/Σc —
    // how PREDICTABLE each state's next step is (H=0: deterministic
    // funnel; H=ln k: uniform wandering). Every ln is ln_ieee of one
    // exact-BIGINT ratio; each H_i folds its ≤|types| terms sorted by
    // target type; the overall rate folds the |types| (w_i·H_i) terms
    // sorted by state — the established LnIeee/sorted-fold bridge,
    // twice.
    //
    // Scale shape: ONE fact-scaled lag-window pair count (per-user
    // partitions, the q_events_transitions shape); everything after is
    // |types|²-bounded.
    QueryDef("q_events_entropy_rate",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        // adjacent pairs read from the family's shared staged adjacency
        // frame (EventAdjacency): the (lag type, type) pairs over rows
        // whose predecessor exists are the same multiset as the former
        // (type, lead type) enumeration, read from the other end
        val pairs = EventAdjacency.frame(s, d)
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type").as("a"), col("event_type").as("b"))
          .agg(count(lit(1)).as("cij"))
        val ci = pairs.groupBy("a").agg(sum("cij").as("ci"))
        val tot = ci.agg(sum("ci").as("ctot"))
        def ln(c: org.apache.spark.sql.Column) = call_function("ln_ieee", c)
        val perState = pairs.join(broadcast(ci), "a")
          .select(col("a"), col("b"), col("cij"), col("ci"),
            (lit(-1.0) * (col("cij").cast("double") / col("ci").cast("double"))
              * ln(col("cij").cast("double") / col("ci").cast("double")))
              .as("term"))
          .groupBy("a")
          .agg(max("ci").as("ci"),
            count(lit(1)).cast("long").as("n_targets"),
            array_sort(collect_list(struct(col("b"), col("term")))).as("ts"))
          .select(col("a"), col("ci").cast("long").as("c_out"), col("n_targets"),
            aggregate(transform(col("ts"), e => e.getField("term")),
              lit(0.0), (acc, x) => acc + x).as("h"))
        val overall = perState.crossJoin(broadcast(tot))
          .select(col("a"),
            ((col("c_out").cast("double") / col("ctot").cast("double"))
              * col("h")).as("wh"))
          .groupBy(lit(1))
          .agg(array_sort(collect_list(struct(col("a"), col("wh")))).as("ws"))
          .select(lit("__overall__").as("a"), lit(0L).as("c_out"),
            lit(0L).as("n_targets"),
            aggregate(transform(col("ws"), e => e.getField("wh")),
              lit(0.0), (acc, x) => acc + x).as("h"))
        perState.unionAll(overall).orderBy("a")
      },
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ms(date_trunc('millisecond', ts)) AS tm
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tm, event_id) AS b
        |  FROM ev),
        |cnt AS (SELECT a, b, count(*)::BIGINT AS cij FROM pairs
        |        WHERE b IS NOT NULL GROUP BY 1, 2),
        |ci AS (SELECT a, sum(cij)::BIGINT AS ci FROM cnt GROUP BY 1),
        |tot AS (SELECT sum(ci)::BIGINT AS ctot FROM ci),
        |terms AS (
        |  SELECT cnt.a, b, ci,
        |    -1.0 * (cij::DOUBLE / ci::DOUBLE) * ln(cij::DOUBLE / ci::DOUBLE)
        |      AS term
        |  FROM cnt JOIN ci ON cnt.a = ci.a),
        |per_state AS (
        |  SELECT a, max(ci)::BIGINT AS c_out, count(*)::BIGINT AS n_targets,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(b := b, term := term))),
        |      e -> struct_extract(e, 'term'))), (x, y) -> x + y) AS h
        |  FROM terms GROUP BY a),
        |overall AS (
        |  SELECT '__overall__' AS a, 0::BIGINT AS c_out, 0::BIGINT AS n_targets,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(a := a,
        |        wh := (c_out::DOUBLE / ctot::DOUBLE) * h))),
        |      e -> struct_extract(e, 'wh'))), (x, y) -> x + y) AS h
        |  FROM per_state, tot)
        |SELECT a, c_out, n_targets, h FROM per_state
        |UNION ALL SELECT a, c_out, n_targets, h FROM overall
        |ORDER BY a""".stripMargin),

    // Curriculum schedule: order the corpus easy→hard by Flesch band
    // (q_text_readability's integer banding), with a deterministic
    // md5 shuffle WITHIN each band (same-difficulty docs must not
    // cluster by source). The global schedule position comes from
    // ops/Sharded — band is the leading sort key, so the decomposition
    // is exact and no unpartitioned window ever sees the corpus.
    QueryDef("q_curation_curriculum",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            expr("size(filter(split(text, ' '), x -> x <> ''))")
              .cast("long").as("w"),
            expr("greatest(1, regexp_count(text, '[.!?]+'))")
              .cast("long").as("sents"),
            expr("greatest(1, regexp_count(lower(text), '[aeiouy]+'))")
              .cast("long").as("syl"))
          .filter(col("w") > 0)
          .withColumn("band",
            floor(expr("""(206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))
              - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)))""") / lit(10.0))
              .cast("long"))
          .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        Sharded.globalRowNumber(scored,
            -col("band"), Seq(col("h"), col("doc_id")), "pos")
          .select(col("doc_id"), col("source"), col("band"), col("pos"))
          .orderBy("pos")
      },
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS w,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT AS sents,
        |    greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))::BIGINT
        |      AS syl
        |  FROM documents),
        |banded AS (
        |  SELECT doc_id, source,
        |    floor((206.835 - 1.015 * (w::DOUBLE / sents::DOUBLE)
        |      - 84.6 * (syl::DOUBLE / w::DOUBLE)) / 10.0)::BIGINT AS band,
        |    md5(doc_id::VARCHAR) AS h
        |  FROM scored WHERE w > 0)
        |SELECT doc_id, source, band,
        |  row_number() OVER (ORDER BY -band, h, doc_id)::BIGINT AS pos
        |FROM banded
        |ORDER BY pos""".stripMargin),
  )
}
