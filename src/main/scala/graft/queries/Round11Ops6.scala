package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sharded

/** Round-11 batch 6: three scale primitives —
  *   - Bloom-pruned join (sideways information passing: a dim-filter's
  *     key set, compressed to a 2 KB sketch, prunes the fact scan
  *     BEFORE the shuffle; the exact join then discards the sketch's
  *     false positives, so results are exactly the plain join's);
  *   - systematic sampling (every k-th element of a hash-shuffled total
  *     order — equal-interval coverage, no clumping, via the sharded
  *     prefix-sum global rank, never a single-task sort);
  *   - percent-rank decile profile (integer-exact percent_rank over
  *     BOUNDED per-customer partitions, histogrammed to deciles).
  */
object Round11Ops6 {

  /** Exact cent count of a 2-decimal quantity stored as double. */
  private def cents(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // Bloom-pruned fact-dim join: suppliers of one nation (the dim
    // filter) are compressed into Spark's own runtime-filter Bloom
    // sketch (functions/BloomFns — the engine's BloomFilterAggregate /
    // BloomFilterMightContain pair) and probed against lineitem BEFORE
    // the join shuffle. At 100 TB this is the manual form of what AQE's
    // runtime filters do when they fire: the fact side drops ~96% of
    // rows (24 of 25 nations) for the cost of a 2 KB broadcast, and the
    // exact join afterwards removes the sketch's false positives — so
    // the oracle is the PLAIN join, bit-for-bit. The sketch is bounded
    // model state (collected once, rebroadcast as a literal — the
    // kmeans-centroid discipline).
    QueryDef("q_join_bloom_pruned",
      (s, d) => {
        graft.functions.BloomFns.register(s)
        val sup = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name")
        val bf = sup.agg(expr(
          "graft_bloom_agg(xxhash64(s_suppkey), 1024L, 16384L)").as("bf"))
          .head().getAs[Array[Byte]](0)
        // empty dim ⇒ null sketch ⇒ nothing can match (not a crash)
        val pruned =
          if (bf == null) Tables.lineitem(s, d).filter(lit(false))
          else Tables.lineitem(s, d)
            .filter(call_function("graft_might_contain",
              lit(bf), xxhash64(col("l_suppkey"))))
        pruned
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_suppkey", "s_name")
          .agg((sum(cents(col("l_extendedprice"))
              * (lit(100) - cents(col("l_discount"))))
            .cast("double") / 1e4).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("s_suppkey")
      },
      """SELECT s_suppkey, s_name,
        |  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT
        |    * (100 - floor(l_discount * 100 + 0.5)::BIGINT))::DOUBLE / 1e4
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY s_suppkey, s_name
        |ORDER BY s_suppkey""".stripMargin),

    // Systematic sample: order the corpus by a hash (md5 of the key —
    // a deterministic shuffle), take every 7th element. Unlike
    // Bernoulli/hash-threshold sampling (q_split_hash), the sample size
    // is EXACTLY ⌈N/7⌉ and maximally spread across the hash order. The
    // global rank comes from ops/Sharded's prefix-sum decomposition
    // (16 shards on the hash's leading nibble — the shard IS a prefix
    // of the sort key), so no unpartitioned window ever sees the
    // corpus: the one-core cliff stays dead.
    QueryDef("q_sample_systematic",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            md5(col("doc_id").cast("string").cast("binary")).as("h"))
        Sharded.globalRowNumber(docs,
            substring(col("h"), 1, 1), Seq(col("h"), col("doc_id")), "rn")
          .filter((col("rn") % 7) === 1)
          .select(col("doc_id"), col("source"), col("n_chars"), col("rn"))
          .orderBy("rn")
      },
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source, n_chars, rn
        |FROM ranked WHERE rn % 7 = 1
        |ORDER BY rn""".stripMargin),

    // Percent-rank decile profile: where does each customer's LATEST
    // order sit within that customer's own order-value history? The
    // rank runs over per-customer partitions (bounded: ≤ dozens of
    // orders per customer at any scale — partitioned window, fully
    // parallel), and the decile is INTEGER-exact:
    // ⌊10·(rn−1)/(cnt−1)⌋ via BIGINT div, capped at 9; single-order
    // customers (percent_rank undefined, 0 by convention) land in
    // decile 0 on both engines by the same convention.
    QueryDef("q_window_percentrank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
        val ranked = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            cents(col("o_totalprice")).as("price_c"))
          .withColumn("rn", row_number().over(
            w.orderBy(col("price_c"), col("o_orderkey"))))
          .withColumn("cnt", count(lit(1)).over(w))
          .withColumn("is_latest", row_number().over(
            w.orderBy(col("o_orderdate").desc, col("o_orderkey").desc)) === 1)
        ranked.filter(col("is_latest"))
          .withColumn("decile",
            when(col("cnt") === 1, lit(0L)).otherwise(
              least(lit(9L), expr("(10 * (rn - 1)) div (cnt - 1)"))))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_customers"),
            sum("cnt").cast("long").as("n_orders"))
          .orderBy("decile")
      },
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY floor(o_totalprice * 100 + 0.5)::BIGINT, o_orderkey)
        |      AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS cnt,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS is_l
        |  FROM orders),
        |latest AS (
        |  SELECT (CASE WHEN cnt = 1 THEN 0
        |          ELSE least(9, (10 * (rn - 1)) // (cnt - 1)) END)::BIGINT
        |      AS decile, cnt
        |  FROM ranked WHERE is_l = 1)
        |SELECT decile, count(*)::BIGINT AS n_customers,
        |  sum(cnt)::BIGINT AS n_orders
        |FROM latest GROUP BY decile
        |ORDER BY decile""".stripMargin),
  )
}
