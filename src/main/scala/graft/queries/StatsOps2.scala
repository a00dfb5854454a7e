package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 stats batch 2 — distribution-DRIFT detection, the
  * monitoring layer a training-data pipeline runs between corpus
  * versions / sources:
  *
  *   - q_stats_ks: two-sample Kolmogorov–Smirnov D between urgent and
  *     non-urgent order values — the sup-norm ECDF distance, computed
  *     ENTIRELY in integers (D's numerator cross-multiplies the two
  *     cumulative counts, so no double enters until the final single
  *     division).
  *   - q_stats_psi: Population Stability Index between the view and
  *     click value distributions over the observed floor(value) integer
  *     buckets, add-1 smoothed over the bucket count — the standard
  *     drift score monitoring dashboards alarm on. Doubles appear
  *     only as ln_ieee of exact integer products (< 2^53) and one
  *     bucket-sorted left fold (the established LnIeee/fold bridge).
  */
object StatsOps2 {

  val defs: Seq[QueryDef] = Seq(

    // Two-sample KS: D = sup_v |F1(v) − F2(v)| over the pooled value
    // axis. Per distinct value (cents), both samples' counts aggregate
    // in ONE combinable pass; the running sums use the SHARDED prefix
    // decomposition (the ops/Sharded discipline — within-shard windows
    // partitioned by value div 2^20 plus a |shards|-row offset frame),
    // so no unpartitioned window ever sees the value axis. The sup and
    // its location are integer max/argmax: d_num = |cum1·n2 − cum2·n1|
    // (≤ n1·n2 ≈ 2e8 here — at petabyte counts the cross-product moves
    // to DECIMAL(38,0), same plan), tie on the SMALLEST value. The one
    // double is the final d = d_num / (n1·n2).
    QueryDef("q_stats_ks",
      (s, d) => {
        val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val vals = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"),
            when(urgent, 1L).otherwise(0L).as("in1"))
          .groupBy("v")
          .agg(sum(col("in1")).as("c1"), sum(lit(1L) - col("in1")).as("c2"))
          .withColumn("shard", expr("v div 1048576"))
        val inShard = vals
          .withColumn("cum1_in", sum("c1").over(Window.partitionBy("shard")
            .orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum2_in", sum("c2").over(Window.partitionBy("shard")
            .orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val offsets = vals.groupBy("shard")
          .agg(sum("c1").as("t1"), sum("c2").as("t2"))
          .withColumn("off1", coalesce(sum("t1").over(Window.orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("off2", coalesce(sum("t2").over(Window.orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("shard", "off1", "off2")
        val totals = broadcast(vals.agg(sum("c1").as("n1"), sum("c2").as("n2")))
        val dd = inShard.join(broadcast(offsets), "shard")
          .crossJoin(totals)
          .select(col("v"), col("n1"), col("n2"),
            abs((col("cum1_in") + col("off1")) * col("n2") -
              (col("cum2_in") + col("off2")) * col("n1")).as("dn"))
          .localCheckpoint(eager = false) // feeds the max and the argmax
        val mx = dd.groupBy("n1", "n2").agg(max("dn").as("d_num"))
        dd.join(broadcast(mx), Seq("n1", "n2"))
          .filter(col("dn") === col("d_num"))
          .groupBy("n1", "n2", "d_num")
          .agg(min("v").as("ks_at"))
          .select(col("n1"), col("n2"), col("d_num"),
            (col("d_num").cast("double") /
              (col("n1") * col("n2")).cast("double")).as("ks_d"),
            col("ks_at"))
      },
      """WITH vals AS (
        |  SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS v,
        |    sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |        THEN 1 ELSE 0 END)::BIGINT AS c1,
        |    sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |        THEN 0 ELSE 1 END)::BIGINT AS c2
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT v,
        |    sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
        |    sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
        |  FROM vals),
        |t AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM vals),
        |dd AS (SELECT v, abs(cum1 * n2 - cum2 * n1)::BIGINT AS dn
        |       FROM c, t)
        |SELECT n1, n2, max(dn)::BIGINT AS d_num,
        |  max(dn)::DOUBLE / (n1 * n2)::DOUBLE AS ks_d,
        |  min(CASE WHEN dn = (SELECT max(dn) FROM dd) THEN v END)::BIGINT
        |    AS ks_at
        |FROM dd, t GROUP BY n1, n2""".stripMargin),

    // PSI between the view and click value distributions over the
    // observed floor(value) buckets, add-1 smoothing over the bucket
    // count B (both engines read B from the same aggregate), PSI =
    // Σ (p−q)·ln(p/q). ln(p/q) rewrites to
    // ln((c1+1)·(n2+B)) − ln((c2+1)·(n1+B)) —
    // both arguments exact integers < 2^53, so ln_ieee (≡ DuckDB ln)
    // agrees bit-for-bit; (p−q) and each term are single IEEE ops; the
    // total folds bucket-sorted. Output: the per-bucket rows plus a
    // -1 summary row carrying the PSI — the shape a drift monitor
    // stores per snapshot pair.
    QueryDef("q_stats_psi",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        def ln(c: org.apache.spark.sql.Column) =
          call_function("ln_ieee", c.cast("double"))
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("view", "click"))
          .select(floor(col("value")).cast("long").as("bucket"),
            when(col("event_type") === "view", 1L).otherwise(0L).as("in1"))
          .groupBy("bucket")
          .agg(sum(col("in1")).as("c1"), sum(lit(1L) - col("in1")).as("c2"))
        val tot = broadcast(ev.agg(sum("c1").as("n1"), sum("c2").as("n2"),
          count(lit(1)).as("nb")))
        val terms = ev.crossJoin(tot)
          .select(col("bucket"), col("c1"), col("c2"),
            (((col("c1") + 1L).cast("double") / (col("n1") + col("nb")).cast("double")) -
              ((col("c2") + 1L).cast("double") / (col("n2") + col("nb")).cast("double")))
              .as("dp"),
            (ln((col("c1") + 1L) * (col("n2") + col("nb"))) -
              ln((col("c2") + 1L) * (col("n1") + col("nb")))).as("lr"))
          .select(col("bucket"), col("c1"), col("c2"),
            (col("dp") * col("lr")).as("psi_term"))
        val total = terms
          .agg(aggregate(
            array_sort(collect_list(struct(col("bucket"), col("psi_term")))),
            lit(0.0), (acc, x) => acc + x.getField("psi_term")).as("psi_term"))
          .select(lit(-1L).as("bucket"), lit(-1L).as("c1"), lit(-1L).as("c2"),
            col("psi_term"))
        terms.unionAll(total).orderBy("bucket")
      },
      """WITH ev AS (
        |  SELECT floor(value)::BIGINT AS bucket,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS c1,
        |    sum(CASE WHEN event_type = 'view' THEN 0 ELSE 1 END)::BIGINT AS c2
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY 1),
        |t AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
        |       count(*)::BIGINT AS nb FROM ev),
        |terms AS (
        |  SELECT bucket, c1, c2,
        |    (((c1 + 1)::DOUBLE / (n1 + nb)::DOUBLE) -
        |     ((c2 + 1)::DOUBLE / (n2 + nb)::DOUBLE)) *
        |    (ln(((c1 + 1) * (n2 + nb))::DOUBLE) -
        |     ln(((c2 + 1) * (n1 + nb))::DOUBLE)) AS psi_term
        |  FROM ev, t)
        |SELECT bucket, c1, c2, psi_term FROM terms
        |UNION ALL
        |SELECT -1, -1, -1,
        |  list_reduce(list_prepend(0.0::DOUBLE,
        |    (SELECT list(psi_term ORDER BY bucket) FROM terms)),
        |    (a, b) -> a + b)
        |ORDER BY bucket""".stripMargin),
  )
}
