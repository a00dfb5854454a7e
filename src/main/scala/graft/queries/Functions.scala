package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function operator surface (SURVEY.md §2.B M3): string, date,
  * math, array, and JSON functions plus the explode generator. All stock
  * `org.apache.spark.sql.functions` built-ins (codegen'd, no UDFs).
  *
  * Cross-engine parity notes (encoded in the oracle SQL):
  *   - Spark `dayofweek` is 1-based Sunday=1; DuckDB `dayofweek` is 0-based.
  *   - Spark `ceil/floor(double)` returns LONG; DuckDB returns DOUBLE →
  *     cast both to BIGINT.
  *   - Array element sums fold left-to-right with a DOUBLE accumulator on
  *     both sides (`aggregate` ↔ `list_reduce(list_transform(...))`) —
  *     bit-identical, unlike DuckDB's float32-accumulating `list_sum`.
  */
object Functions {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_string_fns",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        replace(col("p_brand"), lit("#"), lit("_")).as("brand_safe"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_alpha"),
        substring_index(col("p_name"), " ", 1).as("first_word"),
        instr(col("p_name"), "a").cast("long").as("a_pos"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
           p_brand || '|' || p_type AS brand_type,
           lower(p_name) AS name_lower, upper(p_brand) AS brand_upper,
           substring(p_type, 1, 5) AS type_pfx,
           length(p_name)::BIGINT AS name_len,
           replace(p_brand, '#', '_') AS brand_safe,
           lpad(p_partkey::VARCHAR, 8, '0') AS key_pad,
           trim('  ' || p_name || '  ') AS name_trim,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_alpha,
           split_part(p_name, ' ', 1) AS first_word,
           strpos(p_name, 'a')::BIGINT AS a_pos
         FROM part ORDER BY p_partkey"""),

    QueryDef("q_date_fns",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_1999"),
        add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3m"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
           year(o_orderdate)::BIGINT AS yr, month(o_orderdate)::BIGINT AS mo,
           day(o_orderdate)::BIGINT AS dom,
           (dayofweek(o_orderdate) + 1)::BIGINT AS dow,
           quarter(o_orderdate)::BIGINT AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           last_day(o_orderdate)::TIMESTAMP AS month_end,
           datediff('day', o_orderdate, DATE '1999-01-01')::BIGINT AS days_to_1999,
           date_trunc('day', o_orderdate + INTERVAL 3 MONTH) AS plus3m,
           epoch(o_orderdate)::BIGINT AS epoch_s
         FROM orders ORDER BY o_orderkey"""),

    QueryDef("q_math_fns",
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        signum(col("l_discount") - 0.05).cast("double").as("disc_sign"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        (col("l_orderkey") % 7).as("key_mod7"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")).cast("double").as("disc_amt"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           abs(l_discount - 0.05) AS disc_dev,
           ceil(l_extendedprice)::BIGINT AS price_ceil,
           floor(l_extendedprice)::BIGINT AS price_floor,
           sqrt(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           sign(l_discount - 0.05)::DOUBLE AS disc_sign,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           l_orderkey % 7 AS key_mod7,
           (CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)))::DOUBLE AS disc_amt
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),

    // Array-valued intermediates (slice/sort/flatten) stay under test, but
    // every array-typed OUTPUT is rendered to a deterministic CSV string:
    // the driver's pandas compare cannot sort/hash list cells. Float
    // elements go through floor(x·10⁶)→BIGINT — float→double widening is
    // exact and double multiply/floor are identical IEEE ops on both
    // engines, so the rendering dodges Java-vs-DuckDB float formatting.
    QueryDef("q_array_fns",
      (s, d) => Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).as("first_elem"),
        concat_ws(",", transform(slice(col("embedding"), 1, 3),
          x => floor(x.cast("double") * 1000000d).cast("string"))).as("head3_csv"),
        array_max(col("embedding")).as("elem_max"),
        array_min(col("embedding")).as("elem_min"),
        aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x).as("elem_sum"))
        .orderBy("vec_id"),
      """SELECT vec_id,
           len(embedding)::BIGINT AS dim,
           embedding[1] AS first_elem,
           array_to_string(list_transform(embedding[1:3],
             x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)::VARCHAR), ',') AS head3_csv,
           list_max(embedding) AS elem_max,
           list_min(embedding) AS elem_min,
           list_reduce(list_prepend(0.0, list_transform(embedding, x -> x::DOUBLE)),
                       (a, b) -> a + b) AS elem_sum
         FROM embeddings ORDER BY vec_id"""),

    QueryDef("q_array_fns2",
      (s, d) => {
        val e = col("embedding")
        val toCsv = (a: org.apache.spark.sql.Column) => concat_ws(",",
          transform(a, x => floor(x.cast("double") * 1000000d).cast("string")))
        Tables.embeddings(s, d).select(
          col("vec_id"),
          toCsv(array_sort(slice(e, 1, 4))).as("head4_sorted_csv"),
          array_position(e, array_max(e)).cast("long").as("argmax_1based"),
          array_contains(e, array_min(e)).as("has_min"),
          exists(e, x => x < 0f).as("has_neg"),
          size(filter(e, x => x > 0f)).cast("long").as("n_pos"),
          toCsv(flatten(array(slice(e, 1, 2), slice(e, 3, 2)))).as("head4_flat_csv"))
          .orderBy("vec_id")
      },
      """SELECT vec_id,
           array_to_string(list_transform(list_sort(embedding[1:4]),
             x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)::VARCHAR), ',') AS head4_sorted_csv,
           list_position(embedding, list_max(embedding))::BIGINT AS argmax_1based,
           list_contains(embedding, list_min(embedding)) AS has_min,
           len(list_filter(embedding, x -> x < 0)) > 0 AS has_neg,
           len(list_filter(embedding, x -> x > 0))::BIGINT AS n_pos,
           array_to_string(list_transform(flatten([embedding[1:2], embedding[3:4]]),
             x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)::VARCHAR), ',') AS head4_flat_csv
         FROM embeddings ORDER BY vec_id"""),

    QueryDef("q_cond_fns",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        coalesce(nullif(col("event_type"), lit("click")), lit("WAS_CLICK")).as("type_or_tag"),
        when(col("value") > 100, "high").when(col("value") > 10, "mid")
          .otherwise("low").as("value_band"),
        isnull(nullif(col("event_type"), lit("error"))).as("is_error"),
        nvl2(nullif(col("event_type"), lit("view")), lit(0L), lit(1L)).as("view_flag"),
        greatest(col("value"), lit(50.0)).as("value_floor50"))
        .orderBy("event_id"),
      """SELECT event_id,
           COALESCE(nullif(event_type, 'click'), 'WAS_CLICK') AS type_or_tag,
           CASE WHEN value > 100 THEN 'high' WHEN value > 10 THEN 'mid'
                ELSE 'low' END AS value_band,
           nullif(event_type, 'error') IS NULL AS is_error,
           CASE WHEN nullif(event_type, 'view') IS NOT NULL THEN 0 ELSE 1 END::BIGINT AS view_flag,
           greatest(value, 50.0) AS value_floor50
         FROM events ORDER BY event_id"""),

    QueryDef("q_json_fns",
      // balanced (r17): two JSON parses + one JSON render per row ran
      // single-threaded in the one-row-group scan stage
      (s, d) => Tables.balanced(Tables.events(s, d)
          .select("event_id", "event_type", "props")).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k_typed"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("t")))
          .as("row_json"))
        .orderBy("event_id"),
      """SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.k')::BIGINT AS k_int,
           json_extract_string(props, '$.k')::BIGINT AS k_typed,
           to_json(struct_pack(id := event_id, t := event_type))::VARCHAR AS row_json
         FROM events ORDER BY event_id"""),

    QueryDef("q_explode",
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .orderBy("doc_id", "word"),
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
         FROM documents WHERE doc_id < 50 ORDER BY doc_id, word"""),

    // Custom typed Aggregator (Aggregator[IN,BUF,OUT] via functions.udaf) —
    // exact integer-unit accumulation, see graft.functions.DiscountedRevenue.
    QueryDef("q_udaf",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(graft.functions.Udafs.discountedRevenue(
          col("l_extendedprice"), col("l_discount")).as("disc_revenue"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
           (SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))))::DOUBLE AS disc_revenue
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )
}
