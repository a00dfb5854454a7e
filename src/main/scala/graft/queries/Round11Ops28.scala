package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 28: weekly growth accounting (new / retained /
  * resurrected / churned — the canonical product-analytics user-state
  * decomposition) and mixture KL divergence (how far the current
  * corpus mix sits from a target mix — the drift alarm a data-mixing
  * pipeline monitors).
  *
  * Scale shapes: growth accounting reduces events to the distinct
  * (week, user) frame once, then runs two self-equi-joins keyed on
  * (week±1, user) plus one first-week min — all combinable /
  * hash-joinable, no window over raw events. KL is a |sources|-bounded
  * ln_ieee fold over one count combine.
  */
object Round11Ops28 {

  val defs: Seq[QueryDef] = Seq(

    // Growth accounting per ISO-ish week (epoch-day div 7):
    //   new         — first-ever activity this week
    //   retained    — active this week AND last week
    //   resurrected — active this week, not last week, not new
    //   churned     — active last week, not this week (booked to the
    //                 current week, the standard convention)
    // Identity pinned by the spec: new + retained + resurrected = WAU.
    QueryDef("q_events_growth_accounting",
      (s, d) => {
        val wu = Tables.events(s, d)
          .select((floor(unix_millis(col("ts")) / lit(86400000L)) / lit(7L))
            .cast("long").as("wk"), col("user_id"))
          .distinct()
        val firstWk = wu.groupBy("user_id").agg(min("wk").as("first_wk"))
        val prev = wu.select((col("wk") + 1L).as("wk"),
          col("user_id").as("prev_user"))
        val cur = wu.join(firstWk, "user_id")
          .join(prev, wu("wk") === prev("wk")
            && col("user_id") === col("prev_user"), "left")
          .select(wu("wk").as("wk"), col("user_id"), col("first_wk"),
            col("prev_user").isNotNull.as("was_active"))
        val states = cur.groupBy("wk")
          .agg(count(when(col("first_wk") === col("wk"), lit(1)))
              .cast("long").as("n_new"),
            count(when(col("was_active"), lit(1))).cast("long").as("n_retained"),
            count(when(!col("was_active") && col("first_wk") =!= col("wk"),
              lit(1))).cast("long").as("n_resurrected"))
        // churned into week w: active in w-1, absent in w
        val churned = wu.as("p")
          .join(wu.as("c"),
            col("p.wk") + 1L === col("c.wk")
              && col("p.user_id") === col("c.user_id"), "left_anti")
          .select((col("p.wk") + 1L).as("wk"))
          .groupBy("wk").agg(count(lit(1)).cast("long").as("n_churned"))
        states.join(churned, Seq("wk"), "left")
          .select(col("wk"), col("n_new"), col("n_retained"),
            col("n_resurrected"),
            coalesce(col("n_churned"), lit(0L)).cast("long").as("n_churned"))
          .orderBy("wk")
      },
      // NB: DuckDB `//` on DOUBLE is plain division (no floor) and a
      // ::BIGINT cast ROUNDS — cast the day to BIGINT before the
      // integer floor-div or the week is off by one half the time.
      """WITH wu AS (
        |  SELECT DISTINCT floor(epoch_ms(ts) / 86400000)::BIGINT // 7 AS wk,
        |    user_id
        |  FROM events),
        |first_wk AS (SELECT user_id, min(wk) AS first_wk FROM wu GROUP BY 1),
        |cur AS (
        |  SELECT wu.wk, wu.user_id, f.first_wk,
        |    (p.user_id IS NOT NULL) AS was_active
        |  FROM wu
        |  JOIN first_wk f ON wu.user_id = f.user_id
        |  LEFT JOIN wu p ON p.wk + 1 = wu.wk AND p.user_id = wu.user_id),
        |states AS (
        |  SELECT wk,
        |    count(CASE WHEN first_wk = wk THEN 1 END)::BIGINT AS n_new,
        |    count(CASE WHEN was_active THEN 1 END)::BIGINT AS n_retained,
        |    count(CASE WHEN NOT was_active AND first_wk <> wk THEN 1 END)::BIGINT
        |      AS n_resurrected
        |  FROM cur GROUP BY 1),
        |churned AS (
        |  SELECT p.wk + 1 AS wk, count(*)::BIGINT AS n_churned
        |  FROM wu p
        |  WHERE NOT EXISTS (SELECT 1 FROM wu c
        |                    WHERE c.wk = p.wk + 1 AND c.user_id = p.user_id)
        |  GROUP BY 1)
        |SELECT s.wk, n_new, n_retained, n_resurrected,
        |  coalesce(c.n_churned, 0)::BIGINT AS n_churned
        |FROM states s LEFT JOIN churned c ON s.wk = c.wk
        |ORDER BY s.wk""".stripMargin),

    // KL divergence D(p‖u) and D(p‖target) of the source mix, where p
    // is the observed doc-share per source, u uniform, and target is
    // the corpus-proportional CHARACTER share (a deliberately different
    // measure, so the divergence is non-trivial). Each term is
    // (n_s/N)·ln of a ratio of exact BIGINTs through ln_ieee; folds
    // sort by source. One row per source with both contributions plus
    // a `__total__` row.
    QueryDef("q_mix_kl",
      (s, d) => {
        graft.functions.LnIeee.register(s)
        def ln(c: org.apache.spark.sql.Column) = call_function("ln_ieee", c)
        val counts = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("nd"),
            sum(length(col("text"))).cast("long").as("nc"))
        val tot = counts.agg(sum("nd").cast("long").as("td"),
          sum("nc").cast("long").as("tc"),
          count(lit(1)).cast("long").as("k"))
        val terms = counts.crossJoin(broadcast(tot))
          .select(col("source"), col("nd"),
            ((col("nd").cast("double") / col("td").cast("double"))
              * ln((col("nd") * col("k")).cast("double")
                / col("td").cast("double"))).as("kl_uniform_term"),
            ((col("nd").cast("double") / col("td").cast("double"))
              * ln((col("nd").cast("double") * col("tc").cast("double"))
                / (col("td").cast("double") * col("nc").cast("double"))))
              .as("kl_target_term"))
        val total = terms.groupBy(lit(1))
          .agg(sum("nd").cast("long").as("nd"),
            array_sort(collect_list(struct(col("source"),
              col("kl_uniform_term").as("u"), col("kl_target_term").as("t"))))
              .as("ts"))
          .select(lit("__total__").as("source"), col("nd"),
            aggregate(transform(col("ts"), e => e.getField("u")),
              lit(0.0), (acc, x) => acc + x).as("kl_uniform_term"),
            aggregate(transform(col("ts"), e => e.getField("t")),
              lit(0.0), (acc, x) => acc + x).as("kl_target_term"))
        terms.unionAll(total).orderBy("source")
      },
      """WITH counts AS (
        |  SELECT source, count(*)::BIGINT AS nd,
        |    sum(length(text))::BIGINT AS nc
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT sum(nd)::BIGINT AS td, sum(nc)::BIGINT AS tc,
        |          count(*)::BIGINT AS k FROM counts),
        |terms AS (
        |  SELECT source, nd,
        |    (nd::DOUBLE / td::DOUBLE)
        |      * ln((nd * k)::DOUBLE / td::DOUBLE) AS kl_uniform_term,
        |    (nd::DOUBLE / td::DOUBLE)
        |      * ln((nd::DOUBLE * tc::DOUBLE) / (td::DOUBLE * nc::DOUBLE))
        |      AS kl_target_term
        |  FROM counts, tot),
        |total AS (
        |  SELECT '__total__' AS source, sum(nd)::BIGINT AS nd,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(source := source, u := kl_uniform_term))),
        |      e -> struct_extract(e, 'u'))), (x, y) -> x + y) AS kl_uniform_term,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(source := source, t := kl_target_term))),
        |      e -> struct_extract(e, 't'))), (x, y) -> x + y) AS kl_target_term
        |  FROM terms)
        |SELECT source, nd, kl_uniform_term, kl_target_term FROM terms
        |UNION ALL SELECT source, nd, kl_uniform_term, kl_target_term FROM total
        |ORDER BY source""".stripMargin),
  )
}
