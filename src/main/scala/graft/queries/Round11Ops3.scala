package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 3:
  *
  *   - q_events_markov_stationary: the stationary distribution of the
  *     user-journey Markov chain (where do sessions SPEND their time) —
  *     8 power-iteration rounds over the transition matrix in exact
  *     integer micro-units, the q_graph_pagerank discipline applied to
  *     the |types|-node chain q_events_transitions only counts.
  *   - q_multimodal_scenecut: shot-boundary detection over the opaque
  *     frame-sequence encoding (the q_multimodal_frames fixture: text →
  *     fixed-width frames standing in for decoded video frames; a real
  *     pipeline swaps the framer for the Multimodal codec stub and
  *     keeps this exact plan): adjacent-frame token-set Jaccard, a cut
  *     where 4·|∩| < |∪| (similarity < ~0.25), all integer compares.
  */
object Round11Ops3 {

  val defs: Seq[QueryDef] = Seq(

    // Stationary distribution of the event-type transition chain. The
    // chain is tiny (|types|²) but the COUNTS are corpus-scaled: one
    // lag-window pass per user builds consecutive-pair counts
    // (map-side combined), the matrix row-normalizes to micro-units
    // (pij = cnt·10⁶ div rowtot), and 8 synchronous rounds iterate
    // v'(j) = Σᵢ v(i)·pij div 10⁶ — every term an exact BIGINT, sums
    // order-independent, so the unrolled-CTE oracle hash-matches
    // bit-for-bit (float power iteration would be order-sensitive).
    // Rounds run as |types|-row joins — constant-size after the one
    // fact-scaled pair count. Mass leaks at the per-term div floor and
    // at chain ends (documented, identical on both engines).
    QueryDef("q_events_markov_stationary",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy("tsm", "event_id")
        val pairs = Tables.events(s, d)
          .select(col("user_id"),
            date_trunc("MILLISECOND", col("ts")).as("tsm"),
            col("event_id"), col("event_type").as("a"))
          .withColumn("b", lead("a", 1).over(w))
          .filter(col("b").isNotNull)
          .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
        val rowtot = pairs.groupBy("a").agg(sum("cnt").as("tot"))
        val p = pairs.join(broadcast(rowtot), "a")
          .select(col("a"), col("b"),
            expr("cnt * 1000000 div tot").as("pij"))
          .localCheckpoint(eager = false)
        val types = p.select(col("a").as("t")).distinct()
        var v = types.withColumn("v", lit(1000000L))
        for (_ <- 1 to 8) {
          v = types.join(
            p.join(v.withColumnRenamed("t", "a"), "a")
              .groupBy(col("b").as("t"))
              .agg(sum(expr("v * pij div 1000000")).as("nv")),
            Seq("t"), "left")
            .select(col("t"), coalesce(col("nv"), lit(0L)).as("v"))
            .localCheckpoint(eager = false)
        }
        v.select(col("t").as("event_type"), col("v").as("stationary_micro"))
          .orderBy("event_type")
      }, {
        val rounds = (1 to 8).map { k =>
          s"""v$k AS (
             |  SELECT t.t, coalesce(n.nv, 0)::BIGINT AS v FROM types t
             |  LEFT JOIN (
             |    SELECT p.b AS t, sum(v.v * p.pij // 1000000) AS nv
             |    FROM p JOIN v${k - 1} v ON p.a = v.t GROUP BY 1) n
             |  ON t.t = n.t)""".stripMargin
        }.mkString(",\n")
        s"""WITH ev AS (
           |  SELECT user_id, date_trunc('milliseconds', ts) AS tsm, event_id,
           |    event_type AS a,
           |    lead(event_type) OVER (PARTITION BY user_id
           |      ORDER BY date_trunc('milliseconds', ts), event_id) AS b
           |  FROM events),
           |pairs AS (
           |  SELECT a, b, count(*) AS cnt FROM ev WHERE b IS NOT NULL
           |  GROUP BY 1, 2),
           |rowtot AS (SELECT a, sum(cnt) AS tot FROM pairs GROUP BY 1),
           |p AS (
           |  SELECT pairs.a, pairs.b, pairs.cnt * 1000000 // tot AS pij
           |  FROM pairs JOIN rowtot ON pairs.a = rowtot.a),
           |types AS (SELECT DISTINCT a AS t FROM p),
           |v0 AS (SELECT t, 1000000::BIGINT AS v FROM types),
           |$rounds
           |SELECT t AS event_type, v AS stationary_micro
           |FROM v8 ORDER BY event_type""".stripMargin
      }),

    // Shot-boundary detection over the frame-sequence encoding: each
    // doc's token stream chunks into 8-token frames; adjacent frames
    // compare by token-SET intersection, and a boundary fires where
    // 4·|∩| < |A|+|B|−|∩| (Jaccard < 0.25) — natural text repeats
    // vocabulary within a "scene", so planted near-dup spans cohere
    // while topic shifts cut. Everything stays IN-ROW (chunking,
    // set ops, the cut scan are array expressions over one row — the
    // Winnow map-only discipline); output is one row per doc. On real
    // video the framer is the Multimodal codec path and the feature is
    // a per-frame histogram — the plan (map-only scan, no shuffle
    // until the final order) is identical.
    QueryDef("q_multimodal_scenecut",
      (s, d) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("toks"))
          .withColumn("nf", expr("(size(toks) + 7) div 8"))
          .filter(col("nf") >= 2)
          .withColumn("frames", expr(
            "transform(sequence(0, nf - 1), i -> array_distinct(slice(toks, i * 8 + 1, 8)))"))
          .withColumn("cuts", expr(
            """filter(sequence(1, nf - 1), i ->
              |  4 * size(array_intersect(frames[i - 1], frames[i])) <
              |    size(frames[i - 1]) + size(frames[i]) -
              |      size(array_intersect(frames[i - 1], frames[i])))""".stripMargin))
          .select(col("doc_id"), col("nf").cast("long").as("n_frames"),
            size(col("cuts")).cast("long").as("n_cuts"),
            coalesce(expr("get(cuts, 0)").cast("long"), lit(-1L)).as("first_cut"))
          .orderBy("doc_id")
      },
      """WITH f AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    (len(string_split(text, ' ')) + 7) // 8 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, nf,
        |    list_transform(range(0, nf), i ->
        |      list_distinct(toks[i * 8 + 1 : i * 8 + 8])) AS frames
        |  FROM f WHERE nf >= 2),
        |c AS (
        |  SELECT doc_id, nf,
        |    list_filter(range(1, nf), i ->
        |      4 * len(list_intersect(frames[i], frames[i + 1])) <
        |        len(frames[i]) + len(frames[i + 1]) -
        |          len(list_intersect(frames[i], frames[i + 1]))) AS cuts
        |  FROM fr)
        |SELECT doc_id, nf::BIGINT AS n_frames, len(cuts)::BIGINT AS n_cuts,
        |  coalesce(cuts[1], -1)::BIGINT AS first_cut
        |FROM c ORDER BY doc_id""".stripMargin),
  )
}
