package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 warehouse-maintenance batch: full CDC apply (inserts +
  * updates + DELETE tombstones under sequence order), snapshot diff
  * (the table-compare behind reconciliation and replication audits),
  * and a Deequ-style data-quality constraint suite. Together with
  * q_merge_upsert / q_upsert_latest / q_events_scd2 these complete the
  * table-maintenance story a lakehouse pipeline runs around the
  * analytics itself.
  *
  * All inputs are staged deterministically from `orders`/`lineitem` by
  * key arithmetic (the AlbFixture build-then-process pattern), so both
  * engines derive bit-identical change feeds and the driver hash-check
  * is meaningful.
  */
object WarehouseOps {

  /** Shared snapshot staging for q_snapshot_diff / q_agg_incremental:
    * old = orders minus the %13 keys ("added later"), new = orders
    * minus the %17 keys ("removed") with %5 keys repriced (+1.0). One
    * definition, Spark and SQL renderings kept textually parallel. */
  private def oldFrame(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("old_status"),
        col("o_totalprice").as("old_price"))
  private def neuFrame(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderkey") % 17 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("new_status"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("new_price"))
  private val snapSql =
    """old AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS old_status,
      |         o_totalprice AS old_price
      |  FROM orders WHERE o_orderkey % 13 <> 0),
      |neu AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS new_status,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS new_price
      |  FROM orders WHERE o_orderkey % 17 <> 0)""".stripMargin

  /** Shared CDC changelog staging (Spark-side scaladoc = the contract;
    * the SQL mirror below is line-for-line parallel):
    *   - key % 7 == 0 → seq 1 UPDATE (price + 10)
    *   - key % 21 == 0 → ALSO seq 2 UPDATE (price + 20) — multi-change
    *     keys prove latest-seq-wins ordering
    *   - key % 7 == 3 → seq 1 DELETE tombstone
    *   - key % 7 == 5 → seq 1 INSERT of a brand-new key (key + 10^7)
    */
  private val cdcSql =
    """ch AS (
      |  SELECT o_orderkey AS k, 1::BIGINT AS seq, 'U' AS op,
      |         o_custkey, o_orderstatus, o_totalprice + 10.0 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 2, 'U', o_custkey, o_orderstatus, o_totalprice + 20.0
      |  FROM orders WHERE o_orderkey % 21 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 1, 'D', NULL, NULL, NULL
      |  FROM orders WHERE o_orderkey % 7 = 3
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 1, 'I', o_custkey, 'N', o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 5)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Full CDC MERGE: apply a changelog carrying inserts, whole-row
    // updates AND delete tombstones to a snapshot, latest sequence
    // number winning per key — the Debezium/Delta `MERGE` semantics
    // q_merge_upsert (no deletes) and q_upsert_latest (no base
    // snapshot) each cover half of.
    //
    // Scale shape: changelog compaction is the q_upsert_latest
    // max_by-struct partial aggregate (map-side combine; one row per
    // key reaches the reducer), then ONE full-outer shuffle join on the
    // key applies it to the snapshot — the minimal-shuffle MERGE plan.
    // Tombstones survive compaction (a delete must beat an older
    // update) and drop the row at merge time; nothing rescans either
    // input twice.
    //
    // Determinism: seq is unique per key by construction, so
    // max_by(..., seq) and the oracle's row_number pick the same row;
    // money math stays in doubles only through +10/+20 (exact: TPC-H
    // prices are 2-decimal values well inside IEEE range).
    QueryDef("q_merge_cdc",
      (s, d) => {
        val o = Tables.orders(s, d)
        val upd = o.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("k"), lit(1L).as("seq"), lit("U").as("op"),
            col("o_custkey"), col("o_orderstatus"),
            (col("o_totalprice") + 10.0).as("o_totalprice"))
        val upd2 = o.filter(col("o_orderkey") % 21 === 0)
          .select(col("o_orderkey").as("k"), lit(2L).as("seq"), lit("U").as("op"),
            col("o_custkey"), col("o_orderstatus"),
            (col("o_totalprice") + 20.0).as("o_totalprice"))
        val del = o.filter(col("o_orderkey") % 7 === 3)
          .select(col("o_orderkey").as("k"), lit(1L).as("seq"), lit("D").as("op"),
            lit(null).cast("long").as("o_custkey"),
            lit(null).cast("string").as("o_orderstatus"),
            lit(null).cast("double").as("o_totalprice"))
        val ins = o.filter(col("o_orderkey") % 7 === 5)
          .select((col("o_orderkey") + 10000000L).as("k"), lit(1L).as("seq"),
            lit("I").as("op"), col("o_custkey"), lit("N").as("o_orderstatus"),
            col("o_totalprice"))
        val latest = upd.unionAll(upd2).unionAll(del).unionAll(ins)
          .groupBy("k")
          .agg(max_by(struct(col("op"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice")), col("seq")).as("c"))
          .select(col("k"), col("c.op").as("op"), col("c.o_custkey").as("c_custkey"),
            col("c.o_orderstatus").as("c_status"), col("c.o_totalprice").as("c_price"))
        val snap = o.select(col("o_orderkey").as("k"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
        snap.join(latest, Seq("k"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("k").as("o_orderkey"),
            when(col("op").isNotNull, col("c_custkey"))
              .otherwise(col("o_custkey")).as("o_custkey"),
            when(col("op").isNotNull, col("c_status"))
              .otherwise(col("o_orderstatus")).as("o_orderstatus"),
            when(col("op").isNotNull, col("c_price"))
              .otherwise(col("o_totalprice")).as("o_totalprice"))
          .orderBy("o_orderkey")
      },
      s"""WITH $cdcSql,
         |latest AS (
         |  SELECT k, op, o_custkey AS c_custkey, o_orderstatus AS c_status,
         |         o_totalprice AS c_price
         |  FROM (SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |        FROM ch)
         |  WHERE rn = 1),
         |snap AS (SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice
         |         FROM orders)
         |SELECT k AS o_orderkey,
         |  CASE WHEN op IS NOT NULL THEN c_custkey ELSE o_custkey END AS o_custkey,
         |  CASE WHEN op IS NOT NULL THEN c_status ELSE o_orderstatus END AS o_orderstatus,
         |  CASE WHEN op IS NOT NULL THEN c_price ELSE o_totalprice END AS o_totalprice
         |FROM snap FULL OUTER JOIN latest USING (k)
         |WHERE op IS NULL OR op <> 'D'
         |ORDER BY o_orderkey""".stripMargin),

    // Snapshot diff: row-level compare of two table versions — the
    // reconciliation/replication-audit primitive (and the read side of
    // incremental view maintenance). Old = orders minus the keys
    // "added later" (% 13), new = orders minus the keys "removed"
    // (% 17) with % 5 keys repriced; output only the added / removed /
    // changed rows.
    //
    // Scale shape: ONE full-outer shuffle join on the key; the change
    // predicate is a null-safe column compare (no row serialization,
    // no md5-of-concat — string-rendering doubles is engine-dependent
    // and banned by the repo's determinism rules). Unchanged rows (the
    // overwhelming majority at scale) are filtered before any
    // downstream work. A bucketed/z-ordered layout makes the join
    // co-located; the residual is codegen'd.
    QueryDef("q_snapshot_diff",
      (s, d) => {
        oldFrame(s, d).join(neuFrame(s, d), Seq("k"), "full_outer")
          .withColumn("status",
            when(col("old_price").isNull, "added")
              .when(col("new_price").isNull, "removed")
              .when(!(col("old_price") <=> col("new_price")) ||
                !(col("old_status") <=> col("new_status")), "changed")
              .otherwise("unchanged"))
          .filter(col("status") =!= "unchanged")
          .select(col("k").as("o_orderkey"), col("status"),
            col("old_price"), col("new_price"))
          .orderBy("o_orderkey")
      },
      s"""WITH $snapSql,
        |j AS (
        |  SELECT k, old_status, old_price, new_status, new_price,
        |    CASE WHEN old_price IS NULL THEN 'added'
        |         WHEN new_price IS NULL THEN 'removed'
        |         WHEN old_price IS DISTINCT FROM new_price
        |           OR old_status IS DISTINCT FROM new_status THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM old FULL OUTER JOIN neu USING (k))
        |SELECT k AS o_orderkey, status, old_price, new_price
        |FROM j WHERE status <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin),

    // Data-quality constraint suite (the Deequ/Great-Expectations
    // shape): validate a deliberately-dirtied staging of orders +
    // lineitem against five declared constraints — column completeness,
    // key uniqueness, numeric range, value domain, and referential
    // integrity — and emit the (check, metric, passed) report a
    // pipeline gates promotion on. Violations are INJECTED by key
    // arithmetic (%97 nulls, %89 negative prices, %101 bad status,
    // %61 duplicated keys, %53 orphaned FKs) so the report exercises
    // both pass and fail paths and both engines stage identical dirt.
    //
    // Scale shape: all four orders-side metrics come from ONE
    // conditional-aggregation pass over one scan (count/countDistinct
    // partial-aggregate; the distinct expands to the standard two-stage
    // plan); the FK check is one left-semi join (bloom-prunable, the
    // q_dedup_incremental runtime-filter pattern) plus a count. The
    // report assembly cross-joins three 1-row frames — no corpus-scaled
    // shuffle beyond the semi join. Metrics are single IEEE divisions
    // of exact BIGINTs; `passed` is total (never null).
    QueryDef("q_quality_constraints",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          when(col("o_orderkey") % 61 === 0, lit(999999L))
            .otherwise(col("o_orderkey")).as("k"),
          when(col("o_orderkey") % 97 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")).as("ck"),
          when(col("o_orderkey") % 89 === 0, lit(-1.0))
            .otherwise(col("o_totalprice")).as("price"),
          when(col("o_orderkey") % 101 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("st"))
        val om = o.agg(
          count(lit(1)).as("o_total"),
          count(col("ck")).as("o_ck_nn"),
          countDistinct(col("k")).as("o_k_distinct"),
          sum(when(col("price") >= 0.0 && col("price") <= 1000000.0, 1L)
            .otherwise(0L)).as("o_price_ok"),
          sum(when(col("st").isin("O", "F", "P"), 1L).otherwise(0L)).as("o_st_ok"))
        val l = Tables.lineitem(s, d).select(
          when(col("l_orderkey") % 53 === 0, -col("l_orderkey"))
            .otherwise(col("l_orderkey")).as("fk"))
        val lm = l.agg(count(lit(1)).as("l_total"))
        val lmatch = l.join(Tables.orders(s, d).select(col("o_orderkey").as("fk")),
            Seq("fk"), "left_semi")
          .agg(count(lit(1)).as("l_matched"))
        def frac(n: org.apache.spark.sql.Column, dn: org.apache.spark.sql.Column) =
          n.cast("double") / dn.cast("double")
        om.crossJoin(lm).crossJoin(lmatch)
          .select(explode(array(
            struct(lit("completeness_custkey").as("check"),
              frac(col("o_ck_nn"), col("o_total")).as("metric"),
              lit(0.99).as("threshold")),
            struct(lit("uniqueness_orderkey").as("check"),
              frac(col("o_k_distinct"), col("o_total")).as("metric"),
              lit(1.0).as("threshold")),
            struct(lit("range_totalprice").as("check"),
              frac(col("o_price_ok"), col("o_total")).as("metric"),
              lit(0.98).as("threshold")),
            struct(lit("domain_orderstatus").as("check"),
              frac(col("o_st_ok"), col("o_total")).as("metric"),
              lit(0.98).as("threshold")),
            struct(lit("fk_lineitem_orderkey").as("check"),
              frac(col("l_matched"), col("l_total")).as("metric"),
              lit(0.99).as("threshold")))).as("r"))
          .select(col("r.check").as("check"), col("r.metric").as("metric"),
            (col("r.metric") >= col("r.threshold")).as("passed"))
          .orderBy("check")
      },
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 61 = 0 THEN 999999 ELSE o_orderkey END AS k,
        |    CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS ck,
        |    CASE WHEN o_orderkey % 89 = 0 THEN -1.0 ELSE o_totalprice END AS price,
        |    CASE WHEN o_orderkey % 101 = 0 THEN 'X' ELSE o_orderstatus END AS st
        |  FROM orders),
        |om AS (
        |  SELECT count(*) AS o_total, count(ck) AS o_ck_nn,
        |    count(DISTINCT k) AS o_k_distinct,
        |    sum(CASE WHEN price >= 0.0 AND price <= 1000000.0 THEN 1 ELSE 0 END) AS o_price_ok,
        |    sum(CASE WHEN st IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS o_st_ok
        |  FROM o),
        |l AS (
        |  SELECT CASE WHEN l_orderkey % 53 = 0 THEN -l_orderkey
        |              ELSE l_orderkey END AS fk
        |  FROM lineitem),
        |lm AS (SELECT count(*) AS l_total FROM l),
        |lx AS (SELECT count(*) AS l_matched FROM l
        |       WHERE fk IN (SELECT o_orderkey FROM orders)),
        |checks AS (
        |  SELECT 'completeness_custkey' AS "check", o_ck_nn::DOUBLE / o_total::DOUBLE AS metric,
        |         0.99 AS threshold FROM om
        |  UNION ALL
        |  SELECT 'uniqueness_orderkey', o_k_distinct::DOUBLE / o_total::DOUBLE, 1.0 FROM om
        |  UNION ALL
        |  SELECT 'range_totalprice', o_price_ok::DOUBLE / o_total::DOUBLE, 0.98 FROM om
        |  UNION ALL
        |  SELECT 'domain_orderstatus', o_st_ok::DOUBLE / o_total::DOUBLE, 0.98 FROM om
        |  UNION ALL
        |  SELECT 'fk_lineitem_orderkey', l_matched::DOUBLE / l_total::DOUBLE, 0.99
        |  FROM lm CROSS JOIN lx)
        |SELECT "check", metric, metric >= threshold AS passed
        |FROM checks ORDER BY "check"""".stripMargin),

    // RFM customer segmentation: recency (days since epoch of the last
    // order), frequency (order count), monetary (exact lifetime cents),
    // each graded 1-4 against the population quartiles, concatenated
    // into the classic "444"-style segment code — the CRM/marketing
    // warehouse staple.
    //
    // Scale shape: the textbook ntile(4) formulation needs a GLOBAL
    // single-partition sort per dimension — the one shape this repo
    // bans. Instead the three quartile threshold triplets come from one
    // exact-percentile aggregate over the per-customer frame (bounded:
    // 9 doubles) broadcast back over it, and each grade is a pure
    // projection `1 + (v>q1) + (v>q2) + (v>q3)` — same buckets at the
    // boundaries ntile would draw modulo ties, but embarrassingly
    // parallel. One customer-keyed shuffle total (the groupBy).
    //
    // Determinism: inputs to the percentiles are exact BIGINTs
    // (epoch-days / counts / floor-cents), `percentile` ≡
    // `quantile_cont` bit-for-bit (the q_quality_quantile_filter pin),
    // and the grade comparisons are int-vs-double exact.
    QueryDef("q_customer_rfm",
      (s, d) => {
        val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
        val base = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(datediff(max(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long").as("rdays"),
            count(lit(1)).as("frequency"),
            sum(cents).as("monetary_cents"))
        val th = base.agg(
          percentile(col("rdays"), lit(0.25)).as("r1"),
          percentile(col("rdays"), lit(0.5)).as("r2"),
          percentile(col("rdays"), lit(0.75)).as("r3"),
          percentile(col("frequency"), lit(0.25)).as("f1"),
          percentile(col("frequency"), lit(0.5)).as("f2"),
          percentile(col("frequency"), lit(0.75)).as("f3"),
          percentile(col("monetary_cents"), lit(0.25)).as("m1"),
          percentile(col("monetary_cents"), lit(0.5)).as("m2"),
          percentile(col("monetary_cents"), lit(0.75)).as("m3"))
        def grade(v: org.apache.spark.sql.Column, q1: String, q2: String, q3: String) =
          lit(1L) + (v > col(q1)).cast("long") + (v > col(q2)).cast("long") +
            (v > col(q3)).cast("long")
        base.crossJoin(broadcast(th))
          .select(col("o_custkey"), col("rdays"), col("frequency"),
            col("monetary_cents"),
            grade(col("rdays"), "r1", "r2", "r3").as("r_score"),
            grade(col("frequency"), "f1", "f2", "f3").as("f_score"),
            grade(col("monetary_cents"), "m1", "m2", "m3").as("m_score"))
          .withColumn("segment", concat(col("r_score").cast("string"),
            col("f_score").cast("string"), col("m_score").cast("string")))
          .orderBy("o_custkey")
      },
      """WITH base AS (
        |  SELECT o_custkey,
        |    datediff('day', DATE '1970-01-01', max(o_orderdate))::BIGINT AS rdays,
        |    count(*) AS frequency,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS monetary_cents
        |  FROM orders GROUP BY 1),
        |th AS (
        |  SELECT quantile_cont(rdays, 0.25) AS r1, quantile_cont(rdays, 0.5) AS r2,
        |    quantile_cont(rdays, 0.75) AS r3,
        |    quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
        |    quantile_cont(frequency, 0.75) AS f3,
        |    quantile_cont(monetary_cents, 0.25) AS m1, quantile_cont(monetary_cents, 0.5) AS m2,
        |    quantile_cont(monetary_cents, 0.75) AS m3
        |  FROM base),
        |sc AS (
        |  SELECT o_custkey, rdays, frequency, monetary_cents,
        |    1 + (rdays > r1)::BIGINT + (rdays > r2)::BIGINT + (rdays > r3)::BIGINT AS r_score,
        |    1 + (frequency > f1)::BIGINT + (frequency > f2)::BIGINT + (frequency > f3)::BIGINT AS f_score,
        |    1 + (monetary_cents > m1)::BIGINT + (monetary_cents > m2)::BIGINT + (monetary_cents > m3)::BIGINT AS m_score
        |  FROM base CROSS JOIN th)
        |SELECT o_custkey, rdays, frequency, monetary_cents,
        |  r_score, f_score, m_score,
        |  r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin),

    // Incremental view maintenance: apply the q_snapshot_diff change
    // sliver as ±deltas to the OLD pre-aggregate (count + exact cents
    // per status) instead of rescanning the new snapshot — the IVM
    // step behind materialized-view refresh and streaming upsert
    // sinks. THE ORACLE IS THE PROOF: the Spark side computes the
    // delta-maintained aggregate, the DuckDB side aggregates the new
    // snapshot DIRECTLY — the driver's hash equality is exactly the
    // maintained == recomputed theorem.
    //
    // Scale shape: the unchanged majority is touched ONCE (in the old
    // pre-aggregate, which a real pipeline has stored; here it is
    // rebuilt for self-containment) — the delta path reads only the
    // diff join's changed sliver, contributes -old/+new rows grouped
    // by status (group-bounded frames), and merges with one
    // full-outer join on the tiny group key. Counts and cents are
    // exact BIGINTs, so delta application is associative and
    // order-free — the property IVM needs.
    QueryDef("q_agg_incremental",
      (s, d) => {
        val cents = (c: org.apache.spark.sql.Column) =>
          floor(c * 100 + 0.5).cast("long")
        val diff = oldFrame(s, d).join(neuFrame(s, d), Seq("k"), "full_outer")
          .filter(col("old_price").isNull || col("new_price").isNull ||
            !(col("old_price") <=> col("new_price")) ||
            !(col("old_status") <=> col("new_status")))
        val minus = diff.filter(col("old_price").isNotNull)
          .groupBy(col("old_status").as("o_orderstatus"))
          .agg((-count(lit(1))).as("dn"), (-sum(cents(col("old_price")))).as("dc"))
        val plus = diff.filter(col("new_price").isNotNull)
          .groupBy(col("new_status").as("o_orderstatus"))
          .agg(count(lit(1)).as("dn"), sum(cents(col("new_price"))).as("dc"))
        val delta = minus.unionAll(plus)
          .groupBy("o_orderstatus").agg(sum("dn").as("dn"), sum("dc").as("dc"))
        val oldAgg = oldFrame(s, d)
          .groupBy(col("old_status").as("o_orderstatus"))
          .agg(count(lit(1)).as("n0"), sum(cents(col("old_price"))).as("c0"))
        oldAgg.join(delta, Seq("o_orderstatus"), "full_outer")
          .select(col("o_orderstatus"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_orders"),
            (coalesce(col("c0"), lit(0L)) + coalesce(col("dc"), lit(0L)))
              .as("total_cents"))
          .filter(col("n_orders") > 0)
          .orderBy("o_orderstatus")
      },
      // the DIRECT aggregate of the new snapshot — hash equality with
      // the Spark side's delta-maintained aggregate is the IVM proof
      s"""WITH $snapSql
        |SELECT new_status AS o_orderstatus, count(*) AS n_orders,
        |  sum(floor(new_price * 100 + 0.5)::BIGINT)::BIGINT AS total_cents
        |FROM neu GROUP BY 1 ORDER BY 1""".stripMargin),

    // Revenue concentration: Pareto top-decile share + exact Gini
    // coefficient over per-customer revenue — the 80/20 health metric
    // of any marketplace warehouse. Gini uses the rank formulation
    // G = 2·Σ(rank·xᵢ)/(n·Σx) − (n+1)/n over ascending (revenue,
    // custkey) ranks: every term is an exact BIGINT (cents × rank ≤
    // 1e15 per customer, DECIMAL(38,0) across), so the two closing
    // divisions are the only doubles and both engines share them
    // bit-for-bit. Scale shape: the per-customer rollup is the only
    // fact-sized work; the customer-frame rank is the SHARDED rank
    // (ops/Sharded) keyed on revc div 2^20 — monotone in revc (hundreds of
    // shards over this corpus's revenue range; at a wider range the
    // divisor trades shard count against offset-frame size), so
    // within-shard partitioned row_numbers + a |shards|-row prefix-sum
    // reproduce the global ascending rank with no single-task sort —
    // and one more aggregate collapses it to a single row. The oracle
    // keeps the plain global window, pinning the rewrite exact.
    QueryDef("q_agg_pareto",
      (s, d) => {
        val rev = Tables.orders(s, d)
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("revc"))
          .groupBy("o_custkey")
          .agg(sum(col("revc")).as("revc"))
        val ranked = graft.ops.Sharded.globalRowNumber(rev,
          expr("revc div 1048576"),
          Seq(col("revc").asc, col("o_custkey").asc), "rank")
        val base = ranked.agg(
          count(lit(1)).as("n"), sum(col("revc")).as("tot"),
          sum((col("rank") * col("revc")).cast("decimal(38,0)")).as("sr"))
        val top = ranked.crossJoin(broadcast(base.select(col("n").as("nn"))))
          .filter(col("rank") > expr("nn - nn div 10"))
          .agg(sum(col("revc")).as("toprevc"))
        base.crossJoin(broadcast(top))
          .select(col("n"),
            (col("tot").cast("double") / 100).as("total_revenue"),
            (lit(2.0) * col("sr").cast("double") /
              (col("n").cast("double") * col("tot").cast("double")) -
              (col("n") + 1L).cast("double") / col("n").cast("double")).as("gini"),
            (col("toprevc").cast("double") / col("tot").cast("double"))
              .as("top_decile_share"))
      },
      """WITH rev AS (
        |  SELECT o_custkey,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT) AS revc
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT o_custkey, revc,
        |    row_number() OVER (ORDER BY revc ASC, o_custkey ASC) AS rank
        |  FROM rev),
        |b AS (
        |  SELECT count(*) AS n, sum(revc) AS tot,
        |    sum((rank * revc)::DECIMAL(38,0)) AS sr
        |  FROM r),
        |tp AS (
        |  SELECT sum(revc) AS toprevc FROM r, b WHERE rank > n - n // 10)
        |SELECT n, tot::DOUBLE / 100 AS total_revenue,
        |  2.0 * sr::DOUBLE / (n::DOUBLE * tot::DOUBLE)
        |    - (n + 1)::DOUBLE / n::DOUBLE AS gini,
        |  toprevc::DOUBLE / tot::DOUBLE AS top_decile_share
        |FROM b, tp""".stripMargin),

    // Column-level data profiling (the deequ/dbt-docs primitive): null
    // count, exact distinct count, min/max for seven columns — in ONE
    // scan. Spark computes all 28 aggregates in a single pass (multiple
    // count-distincts plan as one Expand — the scan is not repeated per
    // column) and unpivots via stack(); min/max are stringified only
    // from format-stable types (integers, strings, dates) so the
    // engines' float-formatting differences never enter the hash.
    QueryDef("q_quality_profile",
      (s, d) => {
        // One pre-aggregated branch per column: groupBy(value).count is
        // a map-side-combined two-phase agg over ONE parquet column
        // (columnar scans make 7 narrow reads cheaper than one wide
        // one), then the profile numbers reduce the distinct-value
        // frame. The tempting alternative — seven count(distinct) in
        // one agg — plans as an Expand that duplicates EVERY row 7×
        // with full aggregation machinery attached (measured 13.5 s
        // in-bench vs ~2 s for this shape).
        def branch(c: String, toDate: Boolean) = {
          // min/max on the NATIVE value (numeric order), stringified
          // only afterwards — a min over casted strings would compare
          // lexicographically ('100' < '99')
          val v = if (toDate) col("v").cast("date") else col("v")
          Tables.lineitem(s, d)
            .groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
            .agg(sum("cnt").as("n_rows"),
              sum(when(col("v").isNull, col("cnt")).otherwise(0L))
                .as("n_nulls"),
              count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
              min(v).cast("string").as("min_val"),
              max(v).cast("string").as("max_val"))
            .select(lit(c).as("column_name"), col("n_rows"),
              col("n_nulls"), col("n_distinct"),
              col("min_val"), col("max_val"))
        }
        val plain = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_returnflag", "l_linestatus")
          .map(c => branch(c, toDate = false))
        val date = branch("l_shipdate", toDate = true)
        (plain :+ date).reduce(_.unionAll(_)).orderBy("column_name")
      }, {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_returnflag", "l_linestatus")
        val selects = cols.map { c =>
          s"""SELECT '$c' AS column_name, count(*) AS n_rows,
             sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             count(DISTINCT $c) AS n_distinct,
             min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
           FROM lineitem"""
        } :+
          s"""SELECT 'l_shipdate', count(*),
             sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
             count(DISTINCT l_shipdate),
             min(l_shipdate::DATE)::VARCHAR, max(l_shipdate::DATE)::VARCHAR
           FROM lineitem"""
        selects.mkString("", " UNION ALL ", " ORDER BY column_name")
      }),
  )
}
