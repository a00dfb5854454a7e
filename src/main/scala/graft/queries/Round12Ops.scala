package graft.queries

import org.apache.spark.sql.expressions.Window
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
        |ORDER BY event_id""".stripMargin),

    // One-way ANOVA F across ALL market segments — the k-group
    // generalization q_stats_ttest (2 groups, Welch) was missing: is
    // mean order value equal across segments? Exact integer-cents
    // co-moments per group (n, Σv in BIGINT, Σv² in DECIMAL(38,0) —
    // the spearman overflow lesson), then SSB/SSW/F/η² in ONE shared
    // IEEE expression tree; the only order-sensitive double addition
    // (Σᵢ Sᵢ²/nᵢ over k=5 groups) is a segment-sorted fold on both
    // engines. Scale: one broadcast dim join + one map-side-combined
    // 5-group aggregate; everything after is 5 rows.
    QueryDef("q_stats_anova",
      (s, d) => {
        val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
        val g = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), cents.as("v"))
          .groupBy("seg")
          .agg(count(lit(1)).as("ni"), sum("v").as("si"),
            sum((col("v") * col("v")).cast("decimal(38,0)")).as("ssqi"))
        g.groupBy(lit(1).as("_g"))
          .agg(count(lit(1)).cast("long").as("k"),
            sum("ni").cast("long").as("n"),
            sum(col("si").cast("decimal(38,0)")).as("s_all"),
            sum("ssqi").as("ssq_all"),
            array_sort(collect_list(struct(col("seg"),
              (col("si").cast("double") * col("si").cast("double") /
                col("ni").cast("double")).as("term")))).as("terms"))
          .select(col("k"), col("n"),
            aggregate(col("terms"), lit(0.0),
              (acc, e) => acc + e.getField("term")).as("sb_raw"),
            col("s_all"), col("ssq_all"))
          .select(col("k"), col("n"),
            ((col("sb_raw") - col("s_all").cast("double") *
              col("s_all").cast("double") / col("n").cast("double")) / 1e4)
              .as("ss_between"),
            ((col("ssq_all").cast("double") - col("sb_raw")) / 1e4)
              .as("ss_within"))
          .select(col("k"), col("n"), col("ss_between"), col("ss_within"),
            ((col("ss_between") / (col("k") - 1L).cast("double")) /
              nullif(col("ss_within") / (col("n") - col("k")).cast("double"),
                lit(0.0))).as("f_stat"),
            (col("ss_between") /
              nullif(col("ss_between") + col("ss_within"), lit(0.0)))
              .as("eta_sq"))
      },
      """WITH g AS (
        |  SELECT c_mktsegment AS seg, count(*) AS ni,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS si,
        |    sum(floor(o_totalprice * 100 + 0.5)::HUGEINT
        |        * floor(o_totalprice * 100 + 0.5)::HUGEINT) AS ssqi
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |m AS (
        |  SELECT count(*)::BIGINT AS k, sum(ni)::BIGINT AS n,
        |    sum(si::HUGEINT) AS s_all, sum(ssqi) AS ssq_all,
        |    list_reduce(list_prepend(0.0, list_transform(
        |        list_sort(list(struct_pack(seg := seg,
        |          term := si::DOUBLE * si::DOUBLE / ni::DOUBLE))),
        |        e -> struct_extract(e, 'term'))),
        |      (a, b) -> a + b) AS sb_raw
        |  FROM g),
        |ss AS (
        |  SELECT k, n,
        |    (sb_raw - s_all::DOUBLE * s_all::DOUBLE / n::DOUBLE) / 1e4
        |      AS ss_between,
        |    (ssq_all::DOUBLE - sb_raw) / 1e4 AS ss_within
        |  FROM m)
        |SELECT k, n, ss_between, ss_within,
        |  (ss_between / (k - 1)::DOUBLE)
        |    / nullif(ss_within / (n - k)::DOUBLE, 0.0) AS f_stat,
        |  ss_between / nullif(ss_between + ss_within, 0.0) AS eta_sq
        |FROM ss""".stripMargin),

    // Kruskal–Wallis H across the three return flags on l_quantity —
    // the k-group rank test beside q_stats_mannwhitney (its 2-group
    // member), with the tie correction the integer quantity domain
    // makes mandatory. Midranks come off the VALUE HISTOGRAM (the
    // mannwhitney machinery): mr2 = 2·cumBelow + t + 1 keeps every
    // rank quantity an exact integer (doubled midrank), per-group rank
    // sums accumulate in DECIMAL(38,0) (products would pass 2⁶³ at
    // 10¹⁰ rows), and Σ(t³−t) multiplies in DECIMAL/HUGEINT. H and
    // the correction divide once in DOUBLE through one shared tree;
    // the k=3 Σ R²/n fold is flag-sorted. Scale: one combinable
    // histogram groupBy; the unpartitioned window runs over the
    // ≤|quantity-domain| histogram, never the fact table.
    QueryDef("q_stats_kruskal",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hist = Tables.lineitem(s, d)
          .select(col("l_quantity").cast("long").as("v"), col("l_returnflag").as("f"))
          .groupBy("v")
          .agg(count(when(col("f") === "R", lit(1))).as("nr"),
            count(when(col("f") === "A", lit(1))).as("na"),
            count(when(col("f") === "N", lit(1))).as("nn"))
          .withColumn("t", col("nr") + col("na") + col("nn"))
        val w = Window.orderBy("v")
        val mr = hist.withColumn("mr2",
          lit(2L) * coalesce(sum("t").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
            col("t") + lit(1L))
        def r2(c: String) = sum((col(c).cast("decimal(38,0)") *
          col("mr2").cast("decimal(38,0)"))).as(s"r2_$c")
        val agg = mr.groupBy(lit(1).as("_g"))
          .agg(sum("t").cast("long").as("n"),
            r2("nr"), r2("na"), r2("nn"),
            sum("nr").cast("long").as("n_r"),
            sum("na").cast("long").as("n_a"),
            sum("nn").cast("long").as("n_n"),
            sum((col("t").cast("decimal(38,0)") * col("t").cast("decimal(38,0)")
              * col("t").cast("decimal(38,0)")) - col("t").cast("decimal(38,0)"))
              .as("t3t"))
        // flag-sorted fold of Σ R_g²/n_g (doubled ranks: R2²/4)
        val terms = array_sort(array(
          struct(lit("A").as("fl"), (col("r2_na").cast("double") *
            col("r2_na").cast("double") / col("n_a").cast("double")).as("term")),
          struct(lit("N").as("fl"), (col("r2_nn").cast("double") *
            col("r2_nn").cast("double") / col("n_n").cast("double")).as("term")),
          struct(lit("R").as("fl"), (col("r2_nr").cast("double") *
            col("r2_nr").cast("double") / col("n_r").cast("double")).as("term"))))
        agg
          .select(col("n"), lit(3L).as("k"),
            aggregate(terms, lit(0.0), (acc, e) => acc + e.getField("term"))
              .as("sr2"),
            col("t3t"))
          .select(col("n"), col("k"),
            (lit(3.0) / (col("n").cast("double") * (col("n") + 1L).cast("double"))
              * col("sr2") - lit(3.0) * (col("n") + 1L).cast("double")).as("h_stat"),
            (lit(1.0) - col("t3t").cast("double") /
              (col("n").cast("double") * col("n").cast("double") *
                col("n").cast("double") - col("n").cast("double")))
              .as("tie_c"))
          .select(col("n"), col("k"), col("h_stat"), col("tie_c"),
            (col("h_stat") / nullif(col("tie_c"), lit(0.0))).as("h_corrected"))
      },
      """WITH hist AS (
        |  SELECT l_quantity::BIGINT AS v,
        |    count(*) FILTER (WHERE l_returnflag ='R') AS nr,
        |    count(*) FILTER (WHERE l_returnflag ='A') AS na,
        |    count(*) FILTER (WHERE l_returnflag ='N') AS nn
        |  FROM lineitem GROUP BY 1),
        |mr AS (
        |  SELECT *, nr + na + nn AS t,
        |    2 * coalesce(sum(nr + na + nn) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (nr + na + nn) + 1 AS mr2
        |  FROM hist),
        |agg AS (
        |  SELECT sum(t)::BIGINT AS n,
        |    sum(nr::HUGEINT * mr2::HUGEINT) AS r2_nr,
        |    sum(na::HUGEINT * mr2::HUGEINT) AS r2_na,
        |    sum(nn::HUGEINT * mr2::HUGEINT) AS r2_nn,
        |    sum(nr)::BIGINT AS n_r, sum(na)::BIGINT AS n_a,
        |    sum(nn)::BIGINT AS n_n,
        |    sum(t::HUGEINT * t::HUGEINT * t::HUGEINT - t::HUGEINT) AS t3t
        |  FROM mr),
        |f AS (
        |  SELECT n, 3::BIGINT AS k,
        |    list_reduce(list_prepend(0.0, list_transform(
        |        list_sort([
        |          struct_pack(fl := 'A', term := r2_na::DOUBLE * r2_na::DOUBLE / n_a::DOUBLE),
        |          struct_pack(fl := 'N', term := r2_nn::DOUBLE * r2_nn::DOUBLE / n_n::DOUBLE),
        |          struct_pack(fl := 'R', term := r2_nr::DOUBLE * r2_nr::DOUBLE / n_r::DOUBLE)]),
        |        e -> struct_extract(e, 'term'))),
        |      (a, b) -> a + b) AS sr2,
        |    t3t
        |  FROM agg),
        |h AS (
        |  SELECT n, k,
        |    3.0 / (n::DOUBLE * (n + 1)::DOUBLE) * sr2 - 3.0 * (n + 1)::DOUBLE
        |      AS h_stat,
        |    1.0 - t3t::DOUBLE
        |      / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE) AS tie_c
        |  FROM f)
        |SELECT n, k, h_stat, tie_c,
        |  h_stat / nullif(tie_c, 0.0) AS h_corrected
        |FROM h""".stripMargin),

    // Leave-one-out smoothed target encoding — the feature-engineering
    // staple for high-cardinality categoricals: encode category c for a
    // row with target y as (Σy_c − y + m·prior)/(n_c − 1 + m), so a
    // row never sees its own label (leakage guard) and rare categories
    // shrink toward the global prior (m = 20). The encoding depends
    // only on (category, y), so the output is |cats|×2 rows — emitted
    // as the encoding TABLE a pipeline would broadcast-join back onto
    // the facts. All inputs exact integers; one division in DOUBLE
    // through the identical expression on both engines. Scale: one
    // map-side-combined groupBy + two broadcast scalars.
    QueryDef("q_feature_target_encoding",
      (s, d) => {
        val base = Tables.orders(s, d)
          .select(col("o_orderpriority").as("cat"),
            (col("o_orderstatus") === "F").cast("long").as("y"))
        val cy = base.groupBy("cat", "y").agg(count(lit(1)).as("n_cy"))
        val cstats = base.groupBy("cat")
          .agg(count(lit(1)).as("n_c"), sum("y").as("sy_c"))
        val glob = base.agg(count(lit(1)).as("gn"), sum("y").as("gy"))
        cy.join(broadcast(cstats), "cat")
          .crossJoin(broadcast(glob))
          .select(col("cat"), col("y"), col("n_cy"), col("n_c"),
            ((col("sy_c") - col("y")).cast("double") +
              lit(20.0) * col("gy").cast("double") / col("gn").cast("double"))
              ./(col("n_c").cast("double") - 1.0 + 20.0).as("te"))
          .orderBy("cat", "y")
      },
      """WITH base AS (
        |  SELECT o_orderpriority AS cat,
        |    (o_orderstatus = 'F')::BIGINT AS y
        |  FROM orders),
        |cy AS (SELECT cat, y, count(*) AS n_cy FROM base GROUP BY 1, 2),
        |cs AS (SELECT cat, count(*) AS n_c, sum(y)::BIGINT AS sy_c
        |       FROM base GROUP BY 1),
        |g AS (SELECT count(*) AS gn, sum(y)::BIGINT AS gy FROM base)
        |SELECT cat, y, n_cy, n_c,
        |  ((sy_c - y)::DOUBLE + 20.0 * gy::DOUBLE / gn::DOUBLE)
        |    / (n_c::DOUBLE - 1.0 + 20.0) AS te
        |FROM cy JOIN cs USING (cat) CROSS JOIN g
        |ORDER BY cat, y""".stripMargin),

    // Johnson–Lindenstrauss sign random projection: 64-dim embeddings
    // down to 16 dims through a DETERMINISTIC ±1 matrix (sign of an
    // md5 bit per (i, j) cell — both engines hash identically), scaled
    // by 1/√16, evaluated by the pairwise-L2 distortion d16/d64 over a
    // 40-vector labeled subset. This is the cheap pre-ANN reduction:
    // at 100 TB the projection is a map-only pass (the sign matrix is
    // 1 KB of broadcast state) and the distortion table here is the
    // calibration a pipeline records before trusting the reduced
    // index. Sequence-ordered folds keep every double addition in the
    // same order on both engines.
    QueryDef("q_emb_randproj",
      (s, d) => {
        // the 16×64 sign matrix, computed ONCE on a 1-row frame and
        // broadcast — never per data row
        val sgn = s.range(1).select(expr(
          """transform(sequence(0, 15), j -> transform(sequence(1, 64), i ->
            |  CASE WHEN substring(md5(cast(concat(cast(i AS string), '_',
            |    cast(j AS string)) AS binary)), 1, 1) < '8'
            |  THEN cast(1.0 AS double) ELSE cast(-1.0 AS double) END))""".stripMargin)
          .as("sgn"))
        val e = Tables.embeddings(s, d).filter(col("vec_id") < 40)
        val proj = e.crossJoin(broadcast(sgn))
          .select(col("vec_id"), col("embedding"), expr(
            """transform(sgn, row -> aggregate(sequence(1, 64),
              |  cast(0.0 AS double),
              |  (acc, i) -> acc + element_at(row, i) *
              |    cast(element_at(embedding, i) AS double)) / 4.0)""".stripMargin)
            .as("p16"))
        val a = proj.select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("p16").as("pa"))
        val b = proj.select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("p16").as("pb"))
        a.join(b, col("a") < col("b"))
          .select(col("a"), col("b"),
            sqrt(expr(
              """aggregate(sequence(1, 64), cast(0.0 AS double), (acc, i) ->
                |  acc + (cast(element_at(ea, i) AS double) -
                |         cast(element_at(eb, i) AS double)) *
                |        (cast(element_at(ea, i) AS double) -
                |         cast(element_at(eb, i) AS double)))""".stripMargin))
              .as("d64"),
            sqrt(expr(
              """aggregate(sequence(1, 16), cast(0.0 AS double), (acc, i) ->
                |  acc + (element_at(pa, i) - element_at(pb, i)) *
                |        (element_at(pa, i) - element_at(pb, i)))""".stripMargin))
              .as("d16"))
          .select(col("a"), col("b"), col("d64"), col("d16"),
            (col("d16") / nullif(col("d64"), lit(0.0))).as("distortion"))
          .orderBy("a", "b")
      },
      """WITH sgn AS (
        |  SELECT list_transform(range(0, 16), j ->
        |    list_transform(range(1, 65), i ->
        |      CASE WHEN substring(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 1) < '8'
        |      THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)) AS m),
        |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40),
        |p AS (
        |  SELECT vec_id, embedding,
        |    list_transform(sgn.m, row ->
        |      list_reduce(list_prepend(0.0::DOUBLE,
        |        list_transform(range(1, 65), i ->
        |          row[i] * embedding[i]::DOUBLE)),
        |        (acc, x) -> acc + x) / 4.0) AS p16
        |  FROM e, sgn),
        |pairs AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b,
        |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(range(1, 65), i ->
        |        (x.embedding[i]::DOUBLE - y.embedding[i]::DOUBLE)
        |        * (x.embedding[i]::DOUBLE - y.embedding[i]::DOUBLE))),
        |      (acc, v) -> acc + v)) AS d64,
        |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(range(1, 17), i ->
        |        (x.p16[i] - y.p16[i]) * (x.p16[i] - y.p16[i]))),
        |      (acc, v) -> acc + v)) AS d16
        |  FROM p x JOIN p y ON x.vec_id < y.vec_id)
        |SELECT a, b, d64, d16, d16 / nullif(d64, 0.0) AS distortion
        |FROM pairs ORDER BY a, b""".stripMargin),

    // NDCG@10 of the 8-dim sketch retriever against full-cosine graded
    // relevance — the industry-standard ranking metric beside the
    // repo's RBO (top-weighted agreement) and recall@k members: the
    // full ranking's position defines graded relevance (rel = 11 − r,
    // 0 outside its top-10), the sketch ranking is the system under
    // evaluation, and per query DCG = Σ rel_d / log2(d+1) over the
    // sketch order, normalized by the ideal DCG. log2 goes through
    // ln_ieee (Spark's log is StrictMath and can miss DuckDB's
    // correctly-rounded ln by ulps); both DCG sums are depth-sorted
    // folds. Output 3 rows at any corpus size.
    QueryDef("q_similarity_ndcg",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        graft.functions.LnIeee.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wq = Window.partitionBy("q_id")
        def ranked(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("rn", row_number().over(
            wq.orderBy(col("sim").desc, col("doc_id").asc)).cast("long"))
          .filter(col("rn") <= 10)
        val full = ranked(
          e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("doc_id"),
              call_function("cosine_sim", col("embedding"), col("q_emb"))
                .as("sim")))
          .select(col("q_id"), col("doc_id"), (lit(11L) - col("rn")).as("rel"))
        val sketch = ranked(
          e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("doc_id"),
              expr("""aggregate(zip_with(slice(embedding, 1, 8),
                  slice(q_emb, 1, 8),
                  (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
                0.0D, (acc, x) -> acc + x)""").as("sim")))
        val terms = sketch.join(full, Seq("q_id", "doc_id"), "left")
          .select(col("q_id"), col("rn"),
            (coalesce(col("rel"), lit(0L)).cast("double") /
              (call_function("ln_ieee", (col("rn") + 1L).cast("double")) /
                call_function("ln_ieee", lit(2.0)))).as("dcg_term"))
        terms.groupBy("q_id")
          .agg(array_sort(collect_list(struct(col("rn"), col("dcg_term"))))
            .as("ts"))
          .select(col("q_id"),
            aggregate(transform(col("ts"), e0 => e0.getField("dcg_term")),
              lit(0.0), (acc, x) => acc + x).as("dcg"),
            expr("""aggregate(sequence(1, 10), 0.0D, (acc, d0) ->
                acc + CAST(11 - d0 AS DOUBLE)
                  / (ln_ieee(CAST(d0 + 1 AS DOUBLE)) / ln_ieee(2.0D)))""")
              .as("idcg"))
          .select(col("q_id"), col("dcg"), col("idcg"),
            (col("dcg") / col("idcg")).as("ndcg"))
          .orderBy("q_id")
      },
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 3),
        |fullr AS (
        |  SELECT q_id, doc_id, 11 - rn AS rel FROM (
        |    SELECT q_id, e.vec_id AS doc_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY
        |        ${graft.functions.Similarity.cosineSql("e.embedding", "q.q_emb")}
        |          DESC, e.vec_id ASC) AS rn
        |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) WHERE rn <= 10),
        |sk AS (
        |  SELECT q_id, doc_id, rn FROM (
        |    SELECT q_id, e.vec_id AS doc_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |          i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE)),
        |          (acc, x) -> acc + x) DESC, e.vec_id ASC) AS rn
        |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) WHERE rn <= 10),
        |terms AS (
        |  SELECT sk.q_id, sk.rn,
        |    coalesce(fullr.rel, 0)::DOUBLE
        |      / (ln((sk.rn + 1)::DOUBLE) / ln(2.0)) AS dcg_term
        |  FROM sk LEFT JOIN fullr USING (q_id, doc_id)),
        |agg AS (
        |  SELECT q_id,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(rn := rn, t := dcg_term))),
        |      s0 -> struct_extract(s0, 't'))), (a, b) -> a + b) AS dcg,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 11),
        |      d0 -> (11 - d0)::DOUBLE / (ln((d0 + 1)::DOUBLE) / ln(2.0)))),
        |      (a, b) -> a + b) AS idcg
        |  FROM terms GROUP BY 1)
        |SELECT q_id, dcg, idcg, dcg / idcg AS ndcg
        |FROM agg ORDER BY q_id""".stripMargin),

    // MRR + MAP@10 of the same sketch-vs-full ranking pair — the
    // remaining standard retrieval-eval members (NDCG above grades by
    // position; MRR asks "how deep is the FIRST relevant hit", MAP
    // averages precision at every relevant position). Relevance =
    // membership in the full-cosine top-10. Everything is exact
    // integer arithmetic on ranks until the final divisions; the
    // precision-at-k prefix counts come from a rank-sorted fold.
    // Output: one row per query + a '__mean__' summary (3+1 rows at
    // any corpus size).
    QueryDef("q_similarity_mrr_map",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wq = Window.partitionBy("q_id")
        def ranked(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("rn", row_number().over(
            wq.orderBy(col("sim").desc, col("doc_id").asc)).cast("long"))
          .filter(col("rn") <= 10)
        val full = ranked(
          e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("doc_id"),
              call_function("cosine_sim", col("embedding"), col("q_emb"))
                .as("sim")))
          .select(col("q_id"), col("doc_id"), lit(1L).as("rel"))
        val sketch = ranked(
          e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("doc_id"),
              expr("""aggregate(zip_with(slice(embedding, 1, 8),
                  slice(q_emb, 1, 8),
                  (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
                0.0D, (acc, x) -> acc + x)""").as("sim")))
        val marked = sketch.join(full, Seq("q_id", "doc_id"), "left")
          .select(col("q_id"), col("rn"),
            coalesce(col("rel"), lit(0L)).as("rel"))
        val perQ = marked.groupBy("q_id")
          .agg(array_sort(collect_list(struct(col("rn"), col("rel"))))
            .as("rs"))
          .select(col("q_id"),
            expr("""CASE WHEN exists(rs, r -> r.rel = 1)
                THEN 1.0D / CAST(filter(rs, r -> r.rel = 1)[0].rn AS DOUBLE)
                ELSE 0.0D END""").as("rr"),
            // AP@10: mean over relevant positions of precision@that rank.
            // Prefix relevant counts via O(k²) slice sums (k = 10) — NO
            // multi-field struct accumulator (the DuckDB list_reduce
            // mutating-accumulator trap, QueryDef rules / q_events_holt)
            expr("""CASE WHEN size(filter(rs, r -> r.rel = 1)) = 0 THEN 0.0D
                ELSE aggregate(sequence(1, size(rs)), 0.0D, (acc, i) ->
                  acc + CASE WHEN rs[i - 1].rel = 1
                    THEN CAST(aggregate(slice(rs, 1, i), 0L,
                        (a2, r) -> a2 + r.rel) AS DOUBLE)
                      / CAST(rs[i - 1].rn AS DOUBLE)
                    ELSE 0.0D END)
                  / CAST(size(filter(rs, r -> r.rel = 1)) AS DOUBLE) END""")
              .as("ap"))
        val mean = perQ.groupBy(lit(1).as("_g"))
          .agg(count(lit(1)).as("nq"),
            array_sort(collect_list(struct(col("q_id"), col("rr").as("a"),
              col("ap").as("b")))).as("ts"))
          .select(lit(-1L).as("q_id"),
            (aggregate(transform(col("ts"), t => t.getField("a")), lit(0.0),
              (acc, x) => acc + x) / col("nq").cast("double")).as("rr"),
            (aggregate(transform(col("ts"), t => t.getField("b")), lit(0.0),
              (acc, x) => acc + x) / col("nq").cast("double")).as("ap"))
        perQ.unionAll(mean).orderBy("q_id")
      },
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 3),
        |fullr AS (
        |  SELECT q_id, doc_id FROM (
        |    SELECT q_id, e.vec_id AS doc_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY
        |        ${graft.functions.Similarity.cosineSql("e.embedding", "q.q_emb")}
        |          DESC, e.vec_id ASC) AS rn
        |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) WHERE rn <= 10),
        |sk AS (
        |  SELECT q_id, doc_id, rn FROM (
        |    SELECT q_id, e.vec_id AS doc_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |          i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE)),
        |          (acc, x) -> acc + x) DESC, e.vec_id ASC) AS rn
        |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) WHERE rn <= 10),
        |marked AS (
        |  SELECT sk.q_id, sk.rn,
        |    CASE WHEN fullr.doc_id IS NULL THEN 0 ELSE 1 END AS rel
        |  FROM sk LEFT JOIN fullr USING (q_id, doc_id)),
        |perq AS (
        |  SELECT q_id,
        |    list_sort(list(struct_pack(rn := rn, rel := rel))) AS rs
        |  FROM marked GROUP BY 1),
        |m AS (
        |  SELECT q_id,
        |    CASE WHEN len(list_filter(rs, r -> struct_extract(r, 'rel') = 1)) > 0
        |      THEN 1.0 / struct_extract(
        |        list_filter(rs, r -> struct_extract(r, 'rel') = 1)[1], 'rn')::DOUBLE
        |      ELSE 0.0 END AS rr,
        |    CASE WHEN len(list_filter(rs, r -> struct_extract(r, 'rel') = 1)) = 0
        |      THEN 0.0
        |      ELSE list_reduce(list_prepend(0.0::DOUBLE,
        |        list_transform(range(1, len(rs) + 1), i ->
        |          CASE WHEN struct_extract(rs[i], 'rel') = 1
        |            THEN list_reduce(list_prepend(0::BIGINT,
        |                list_transform(list_slice(rs, 1, i),
        |                  r -> struct_extract(r, 'rel')::BIGINT)),
        |                (a2, x) -> a2 + x)::DOUBLE
        |              / struct_extract(rs[i], 'rn')::DOUBLE
        |            ELSE 0.0::DOUBLE END)),
        |        (a, b) -> a + b)
        |        / len(list_filter(rs, r -> struct_extract(r, 'rel') = 1))::DOUBLE
        |      END AS ap
        |  FROM perq),
        |mean AS (
        |  SELECT -1::BIGINT AS q_id,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(q := q_id, v := rr))),
        |      s0 -> struct_extract(s0, 'v'))), (a, b) -> a + b)
        |      / count(*)::DOUBLE AS rr,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(q := q_id, v := ap))),
        |      s0 -> struct_extract(s0, 'v'))), (a, b) -> a + b)
        |      / count(*)::DOUBLE AS ap
        |  FROM m)
        |SELECT q_id, rr, ap FROM m
        |UNION ALL SELECT q_id, rr, ap FROM mean
        |ORDER BY q_id""".stripMargin),

    // Weight of evidence + information value of banded order value vs
    // the F-status target — the feature-screening pass run before any
    // model training: WOE_i = ln((g_i/G)/(b_i/B)) per band, IV =
    // Σ (g_i/G − b_i/B)·WOE_i. Exact integer band counts; the ln goes
    // through ln_ieee on one exact product ratio (products widened to
    // DECIMAL — g_i·B passes 2⁶³ at 10¹⁰ rows); the IV sum is a
    // band-sorted fold. Output: per-band rows + a band = -1 summary
    // carrying the IV. One combinable groupBy; everything after is
    // |bands| rows.
    QueryDef("q_feature_woe_iv",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        val bands = Tables.orders(s, d)
          .select(least(floor(col("o_totalprice") / 50000.0), lit(5.0))
            .cast("long").as("band"),
            (col("o_orderstatus") === "F").cast("long").as("y"))
          .groupBy("band")
          .agg(sum("y").as("g"), sum(lit(1L) - col("y")).as("b"))
        val tot = bands.agg(sum("g").cast("long").as("gt"),
          sum("b").cast("long").as("bt"))
        val per = bands.crossJoin(broadcast(tot))
          .select(col("band"), col("g").as("n_good"), col("b").as("n_bad"),
            call_function("ln_ieee",
              (col("g").cast("decimal(38,0)") * col("bt").cast("decimal(38,0)"))
                .cast("double") /
              nullif((col("b").cast("decimal(38,0)") *
                col("gt").cast("decimal(38,0)")).cast("double"), lit(0.0)))
              .as("woe"))
          .crossJoin(broadcast(tot))
          .withColumn("iv_term",
            (col("n_good").cast("double") / col("gt").cast("double") -
              col("n_bad").cast("double") / col("bt").cast("double")) *
              col("woe"))
          .select("band", "n_good", "n_bad", "woe", "iv_term")
        val total = per.groupBy(lit(1).as("_g"))
          .agg(sum("n_good").cast("long").as("n_good"),
            sum("n_bad").cast("long").as("n_bad"),
            array_sort(collect_list(struct(col("band"), col("iv_term"))))
              .as("ts"))
          .select(lit(-1L).as("band"), col("n_good"), col("n_bad"),
            lit(0.0).as("woe"),
            aggregate(transform(col("ts"), e => e.getField("iv_term")),
              lit(0.0), (acc, x) => acc + x).as("iv_term"))
        per.unionAll(total).orderBy("band")
      },
      """WITH bands AS (
        |  SELECT least(floor(o_totalprice / 50000.0), 5.0)::BIGINT AS band,
        |    sum((o_orderstatus = 'F')::BIGINT)::BIGINT AS g,
        |    sum((o_orderstatus <> 'F')::BIGINT)::BIGINT AS b
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(g)::BIGINT AS gt, sum(b)::BIGINT AS bt FROM bands),
        |per AS (
        |  SELECT band, g AS n_good, b AS n_bad,
        |    ln((g::HUGEINT * bt::HUGEINT)::DOUBLE
        |       / nullif((b::HUGEINT * gt::HUGEINT)::DOUBLE, 0.0)) AS woe,
        |    (g::DOUBLE / gt::DOUBLE - b::DOUBLE / bt::DOUBLE)
        |      * ln((g::HUGEINT * bt::HUGEINT)::DOUBLE
        |           / nullif((b::HUGEINT * gt::HUGEINT)::DOUBLE, 0.0)) AS iv_term
        |  FROM bands CROSS JOIN t),
        |tot AS (
        |  SELECT -1::BIGINT AS band, sum(n_good)::BIGINT AS n_good,
        |    sum(n_bad)::BIGINT AS n_bad, 0.0 AS woe,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(band := band, t := iv_term))),
        |      s0 -> struct_extract(s0, 't'))), (a, b) -> a + b) AS iv_term
        |  FROM per)
        |SELECT * FROM per UNION ALL SELECT * FROM tot ORDER BY band""".stripMargin),

    // Deterministic stratified k-fold assignment — the cross-validation
    // split every training pipeline needs: fold = md5(id) % 5 is
    // reproducible across runs, engines, and partitionings (no RNG
    // state; the established `('0x'||hex)::BIGINT` md5 bridge), and the
    // output is the (fold × label) balance audit a pipeline checks
    // before trusting the split: per-cell counts plus each fold's
    // share of its label (should all sit near 1/k). The hash-based
    // assignment also inherits the q_split_hash leakage property:
    // identical ids always land in the same fold. One
    // map-side-combined groupBy; |folds|×|labels| rows out.
    QueryDef("q_split_kfold",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select((expr(
            "conv(substring(md5(cast(o_orderkey AS string)), 1, 4), 16, 10)")
            .cast("long") % 5).as("fold"),
            col("o_orderstatus").as("label"))
          .groupBy("fold", "label").agg(count(lit(1)).as("n"))
        val perLabel = cells.groupBy("label").agg(sum("n").as("n_label"))
        cells.join(broadcast(perLabel), "label")
          .select(col("fold"), col("label"), col("n"),
            (col("n").cast("double") / col("n_label").cast("double"))
              .as("label_share"))
          .orderBy("fold", "label")
      },
      """WITH cells AS (
        |  SELECT ('0x' || substring(md5(o_orderkey::VARCHAR), 1, 4))::BIGINT % 5
        |    AS fold, o_orderstatus AS label, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |pl AS (SELECT label, sum(n)::BIGINT AS n_label FROM cells GROUP BY 1)
        |SELECT fold, label, n, n::DOUBLE / n_label::DOUBLE AS label_share
        |FROM cells JOIN pl USING (label)
        |ORDER BY fold, label""".stripMargin)
  )
}
