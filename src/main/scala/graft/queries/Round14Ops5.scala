package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 batch 5: resampling inference made relational AND
  * deterministic (a hash-seeded randomization test — no RNG state, so
  * both engines draw the SAME "random" relabelings), and greedy
  * submodular data selection (facility-location/max-coverage — the
  * coverage-driven "pick the k most complementary documents" curation
  * primitive).
  */
object Round14Ops5 {

  val defs: Seq[QueryDef] = Seq(

    // Randomization test for the linestatus difference in mean quantity
    // — the distribution-free alternative to q_stats_ttest when nothing
    // Gaussian can be assumed. The classic obstacle to resampling in a
    // deterministic cross-engine pipeline is the RNG; here each of B=32
    // relabelings is a HASH of (row key, b) — the md5↔BIGINT bridge
    // both engines share (ops/Dedup discipline) — so the "random" draws
    // are identical everywhere, restartable, and partition-order-free.
    // Unconstrained Bernoulli relabeling (each row flips independently,
    // group sizes not fixed) is the approximate-randomization variant
    // standard in NLP system comparison (Yeh 2000); p = (1 + #{b :
    // stat_b ≥ stat_obs}) / (B + 1), the add-one Monte-Carlo estimator.
    // Row keys use the FULL (orderkey, linenumber, partkey, suppkey) —
    // synthetic lineitem's (orderkey, linenumber) alone is not unique.
    //
    // ONE digest per row, not per (row, b): all 32 labels are the low
    // 32 BITS of a single md5(key) — md5's bits are independent, so
    // bit b is a fresh Bernoulli(1/2) per permutation, and the hash
    // work drops 32× (the naive md5(key||b) shape measured 16.9 s at
    // sf0.1; this one ~1 s — the digest is computed BEFORE the 32×
    // Expand, which then fans out two small ints).
    //
    // Scale shape: one fact scan computing the digest → 32× Expand of
    // (v, h) int pairs → map-side-combined groupBy(b) of conditional
    // BIGINT sums — 32 result rows; the observed stat is one more
    // combinable aggregate. Every stat is two divisions of exact
    // BIGINTs, |difference| compared exactly.
    QueryDef("q_stats_permtest",
      (s, d) => {
        // balanced BEFORE the per-row md5 + 32× Expand (r17): the hash
        // work is the query's floor and ran single-threaded in the
        // one-row-group scan stage; no-op on real multi-file input
        val li = Tables.balanced(Tables.lineitem(s, d)
            .select("l_orderkey", "l_linenumber", "l_partkey",
              "l_suppkey", "l_quantity", "l_linestatus"))
          .select(
          concat_ws("|", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")).as("key"),
          col("l_quantity").cast("long").as("v"),
          (col("l_linestatus") === lit("O")).cast("long").as("g"))
        val obs = li.agg(count(lit(1)).as("n"),
            sum(col("v") * col("g")).as("s1"), sum("g").as("n1"),
            sum(col("v") * (lit(1) - col("g"))).as("s0"),
            (count(lit(1)) - sum("g")).as("n0"))
          .select(col("n"),
            // same degenerate-corpus guard as the permutation branch: a
            // single-linestatus corpus makes n1 or n0 zero, and 0/0 must
            // be NULL on both engines, not Infinity (ADVICE r14)
            abs(col("s1").cast("double") /
                nullif(col("n1"), lit(0L)).cast("double") -
              col("s0").cast("double") /
                nullif(col("n0"), lit(0L)).cast("double"))
              .as("stat_obs"))
        val perms = li
          .select(col("v"),
            conv(substring(md5(col("key")), 1, 8), 16, 10).cast("long")
              .as("h"))
          .select(col("v"), col("h"),
            explode(sequence(lit(0), lit(31))).as("b"))
          .withColumn("lbl", expr("shiftright(h, b) & 1L"))
          .groupBy("b")
          .agg(sum(col("v") * col("lbl")).as("s1"), sum("lbl").as("n1"),
            sum(col("v") * (lit(1) - col("lbl"))).as("s0"),
            (count(lit(1)) - sum("lbl")).as("n0"))
          .select(col("b"),
            abs(col("s1").cast("double") /
                nullif(col("n1"), lit(0L)).cast("double") -
              col("s0").cast("double") /
                nullif(col("n0"), lit(0L)).cast("double")).as("stat_b"))
        perms.crossJoin(broadcast(obs))
          .agg(first("n").as("n"), first("stat_obs").as("stat_obs"),
            sum(when(col("stat_b") >= col("stat_obs"), 1L).otherwise(0L))
              .as("n_ge"))
          .select(col("n"), col("stat_obs"), col("n_ge"),
            ((col("n_ge") + lit(1)).cast("double") / lit(33.0)).as("p_value"))
      },
      """WITH li AS (
        |  SELECT l_orderkey || '|' || l_linenumber || '|' || l_partkey
        |           || '|' || l_suppkey AS key,
        |         l_quantity::BIGINT AS v,
        |         CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS g
        |  FROM lineitem),
        |obs AS (
        |  SELECT count(*)::BIGINT AS n,
        |    abs(sum(v * g)::DOUBLE / nullif(sum(g), 0)::DOUBLE
        |      - sum(v * (1 - g))::DOUBLE
        |        / nullif(count(*) - sum(g), 0)::DOUBLE)
        |      AS stat_obs
        |  FROM li),
        |perms AS (
        |  SELECT b,
        |    abs(sum(v * lbl)::DOUBLE / nullif(sum(lbl), 0)::DOUBLE
        |      - sum(v * (1 - lbl))::DOUBLE
        |        / nullif(count(*) - sum(lbl), 0)::DOUBLE) AS stat_b
        |  FROM (
        |    SELECT v, b, (h >> b) & 1 AS lbl
        |    FROM (SELECT v, ('0x' || substring(md5(key), 1, 8))::BIGINT AS h
        |          FROM li),
        |         (SELECT unnest(range(0, 32)) AS b))
        |  GROUP BY b)
        |SELECT n, stat_obs,
        |  sum(CASE WHEN stat_b >= stat_obs THEN 1 ELSE 0 END)::BIGINT AS n_ge,
        |  (sum(CASE WHEN stat_b >= stat_obs THEN 1 ELSE 0 END) + 1)::DOUBLE
        |    / 33.0 AS p_value
        |FROM perms, obs GROUP BY n, stat_obs""".stripMargin),

    // Greedy submodular (max-coverage) document selection — "pick the 3
    // documents that together cover the most distinct content", the
    // facility-location curation primitive behind coverage-driven data
    // selection. Greedy is (1−1/e)-optimal for monotone submodular
    // objectives, and each round is pure relational algebra: marginal
    // gain = |shingles(doc) \ covered|, argmax with a doc_id tiebreak,
    // covered grows by the winner's shingles. Coverage units are 5-char
    // shingles (the q_text_jaccard granularity) — a word-level universe
    // saturates on this corpus (31 distinct words at sf0.001: ONE doc
    // covers everything and rounds 2-3 have no positive gain), while the
    // shingle universe grows with content, which is also why real
    // coverage-selection uses n-grams, not unigrams. k=3 rounds UNROLLED
    // (no driver loop — one lazy plan; assumes ≥3 docs with positive
    // marginal gain, which the shingle universe guarantees short of
    // near-identical documents).
    //
    // Scale shape: the per-round anti-join keys on `word` against the
    // COVERED set (≤ k documents' vocabularies — broadcastable by
    // construction at any corpus size); gains are map-side-combined
    // counts; each argmax is a TakeOrdered(1), not a global sort.
    QueryDef("q_curation_submodular",
      (s, d) => {
        // the shingle frame feeds all three rounds' gains, anti-joins,
        // and covered-set builds (~8 plan references) — materialize it
        // ONCE (eager: lazy localCheckpoint does not truncate under
        // AQE, the round-13 finding; the naive shape re-exploded the
        // corpus per reference and measured 11.9 s at sf0.1, this ~2 s)
        val docs = Tables.documents(s, d)
        // array_distinct INSIDE the row (r17): (doc_id, word) pairs are
        // unique within a document, so per-doc in-map dedup replaces the
        // corpus-wide distinct — the full shingle stream never shuffles
        // at all (guide §2.4; the old shape exchanged every exploded
        // 5-gram to dedup pairs that were only ever duplicated within
        // one row). documentsBalanced parallelizes the explode, which
        // otherwise runs single-threaded on the one-row-group local scan.
        val shingles = explode(array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
          i => col("text").substr(i, lit(5))))).as("word")
        val types = Tables.documentsBalanced(s, d)
          .select(col("doc_id"), shingles)
          .localCheckpoint(eager = true)
        def top1(g: org.apache.spark.sql.DataFrame) =
          g.orderBy(col("gain").desc, col("doc_id").asc).limit(1)
        // a round winner's shingle set comes from the |picks|-row
        // filtered DOCUMENTS scan, not another pass over the
        // corpus-sized shingle frame — 3 big scans saved
        def coveredOf(p: org.apache.spark.sql.DataFrame) =
          docs.join(broadcast(p.select("doc_id")), "doc_id")
            .select(col("doc_id"), shingles).select("word").distinct()
        // p1/c1/p2/c2 are k-BOUNDED (1-row picks; covered sets ≤ k docs'
        // vocabularies) but feed 2–4 consumers each, and lazily every
        // consumer re-executed the full prior round chain (measured:
        // 17 documents scans / 51 Exchanges in the captured plan —
        // r17 optimization round, second pass). Eager checkpoints make
        // each greedy round execute exactly once; content unchanged.
        val p1 = top1(types.groupBy("doc_id")
          .agg(count(lit(1)).as("gain"))).localCheckpoint(eager = true)
        val c1 = coveredOf(p1).localCheckpoint(eager = true)
        val t2 = types
          .join(broadcast(p1.select("doc_id")), Seq("doc_id"), "left_anti")
          .join(broadcast(c1), Seq("word"), "left_anti")
        val p2 = top1(t2.groupBy("doc_id").agg(count(lit(1)).as("gain")))
          .localCheckpoint(eager = true)
        val c2 = c1.unionByName(coveredOf(p2)).distinct()
          .localCheckpoint(eager = true)
        val picked12 = p1.select("doc_id").unionByName(p2.select("doc_id"))
        val t3 = types
          .join(broadcast(picked12), Seq("doc_id"), "left_anti")
          .join(broadcast(c2), Seq("word"), "left_anti")
        val p3 = top1(t3.groupBy("doc_id").agg(count(lit(1)).as("gain")))
          .localCheckpoint(eager = true)
        val c3 = c2.unionByName(coveredOf(p3)).distinct()
        def row(r: Int, p: org.apache.spark.sql.DataFrame,
            c: org.apache.spark.sql.DataFrame) =
          p.crossJoin(broadcast(c.agg(count(lit(1)).as("covered_total"))))
            .select(lit(r.toLong).as("round"), col("doc_id"), col("gain"),
              col("covered_total"))
        row(1, p1, c1).unionByName(row(2, p2, c2)).unionByName(row(3, p3, c3))
          .orderBy("round")
      },
      """WITH types AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(length(text) - 4, 1) + 1),
        |      i -> substring(text, i, 5))) AS word
        |    FROM documents)),
        |p1 AS (SELECT doc_id, count(*)::BIGINT AS gain FROM types
        |       GROUP BY 1 ORDER BY gain DESC, doc_id ASC LIMIT 1),
        |c1 AS (SELECT DISTINCT word FROM types
        |       WHERE doc_id IN (SELECT doc_id FROM p1)),
        |t2 AS (SELECT * FROM types
        |       WHERE doc_id NOT IN (SELECT doc_id FROM p1)
        |         AND word NOT IN (SELECT word FROM c1)),
        |p2 AS (SELECT doc_id, count(*)::BIGINT AS gain FROM t2
        |       GROUP BY 1 ORDER BY gain DESC, doc_id ASC LIMIT 1),
        |c2 AS (SELECT word FROM c1 UNION
        |       SELECT DISTINCT word FROM types
        |       WHERE doc_id IN (SELECT doc_id FROM p2)),
        |t3 AS (SELECT * FROM types
        |       WHERE doc_id NOT IN (SELECT doc_id FROM p1)
        |         AND doc_id NOT IN (SELECT doc_id FROM p2)
        |         AND word NOT IN (SELECT word FROM c2)),
        |p3 AS (SELECT doc_id, count(*)::BIGINT AS gain FROM t3
        |       GROUP BY 1 ORDER BY gain DESC, doc_id ASC LIMIT 1),
        |c3 AS (SELECT word FROM c2 UNION
        |       SELECT DISTINCT word FROM types
        |       WHERE doc_id IN (SELECT doc_id FROM p3))
        |SELECT 1::BIGINT AS round, doc_id, gain,
        |       (SELECT count(*)::BIGINT FROM c1) AS covered_total FROM p1
        |UNION ALL
        |SELECT 2::BIGINT, doc_id, gain,
        |       (SELECT count(*)::BIGINT FROM c2) FROM p2
        |UNION ALL
        |SELECT 3::BIGINT, doc_id, gain,
        |       (SELECT count(*)::BIGINT FROM c3) FROM p3
        |ORDER BY round""".stripMargin))
}
