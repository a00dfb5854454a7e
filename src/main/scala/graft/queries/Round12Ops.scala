package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 batch 1: Spark 4 VARIANT ingestion — the semi-structured
  * path a user with a raw JSON lake hits first (VERDICT r11 "What's
  * missing" #3). `parse_json` turns the string column into an open
  * VariantType value (binary-encoded, no schema declared up front);
  * `variant_get(v, '$.path', 'type')` is the typed extraction that
  * replaces brittle regex/JSON-string surgery.
  *
  * Scale shape: variant parse + extraction are per-row, codegen'd, and
  * shuffle-free; the only exchange in either query is the final small
  * rollup (map-side combined). Column pruning still reaches the parquet
  * scan — only (event_type, props) are read for the rollup (pinned in
  * Round12Spec). At 100 TB the lakehouse upgrade is storing `props` AS
  * a parquet VARIANT column, where Spark 4's variant shredding pushes
  * the accessed paths into the scan itself; the query text here is
  * unchanged under that migration — which is the point of the type.
  */
object Round12Ops {

  val defs: Seq[QueryDef] = Seq(

    // Variant ingestion + typed extraction + rollup over the real
    // events.props JSON: per event_type, the count, exact sum, distinct
    // count, and >=50 band of the extracted '$.k' integer. NULL-safe:
    // rows whose props lack '$.k' (none in this corpus, any in a real
    // lake) drop via the is-not-null filter on BOTH engines.
    QueryDef("q_json_variant",
      (s, d) => {
        val k = expr("variant_get(parse_json(props), '$.k', 'bigint')")
        Tables.events(s, d)
          .select(col("event_type"), k.as("k"))
          .filter(col("k").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("k").as("sum_k"),
            countDistinct(col("k")).as("n_k"),
            sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_hi"))
          .orderBy("event_type")
      },
      """WITH x AS (
        |  SELECT event_type, json_extract(props, '$.k')::BIGINT AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, sum(k)::BIGINT AS sum_k,
        |  count(DISTINCT k) AS n_k,
        |  sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END)::BIGINT AS n_hi
        |FROM x WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Nested-variant roundtrip: build a nested document (object, nested
    // object, array) from typed columns, parse it to VARIANT, and
    // extract every leaf back through typed paths — object field,
    // nested field, array index. The oracle computes the SAME leaves
    // directly from the base columns, so the hash gate proves the
    // variant encode→parse→extract roundtrip is the identity on
    // integers and strings (the property a lakehouse migration relies
    // on). Bounded output: the first 100 events by id (filter pushed
    // to the scan).
    QueryDef("q_json_variant_nested",
      (s, d) => {
        val cents = floor(col("value") * 100 + 0.5).cast("long")
        val k = expr("variant_get(parse_json(props), '$.k', 'bigint')")
        val built = Tables.events(s, d)
          .filter(col("event_id") < 100)
          .select(col("event_id"),
            to_json(struct(
              col("user_id").as("u"),
              struct(col("event_type").as("t"), cents.as("v")).as("m"),
              array(k, k * 2).as("a"))).as("j"))
          .select(col("event_id"), expr("parse_json(j)").as("pv"))
        built.select(col("event_id"),
            expr("variant_get(pv, '$.u', 'bigint')").as("u"),
            expr("variant_get(pv, '$.m.t', 'string')").as("t"),
            expr("variant_get(pv, '$.m.v', 'bigint')").as("mv"),
            expr("variant_get(pv, '$.a[1]', 'bigint')").as("a1"))
          .orderBy("event_id")
      },
      """SELECT event_id, user_id AS u, event_type AS t,
        |  floor(value * 100 + 0.5)::BIGINT AS mv,
        |  (json_extract(props, '$.k')::BIGINT * 2)::BIGINT AS a1
        |FROM events WHERE event_id < 100
        |ORDER BY event_id""".stripMargin)
  )
}
