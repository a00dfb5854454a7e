package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Round-11 batch 27: the Ljung–Box portmanteau test (is the daily
  * series white noise, or autocorrelated? — the residual diagnostic
  * run after every forecast fit) and embedding outlier detection
  * (vectors far from their own class centroid — mislabeled or junk
  * points a curation pass quarantines).
  *
  * Scale shapes: Ljung–Box folds the |days|-bounded centered series
  * in-row (position-ordered products — one combinable day count is the
  * only corpus-scaled step); outliers join each vector to its class
  * centroid (|labels|·d broadcast model state) and flag by an integer
  * cross-multiplication against the class mean distance.
  */
object Round11Ops27 {

  val defs: Seq[QueryDef] = Seq(

    // Ljung–Box Q over lags 1..7 of the daily event-count series.
    // Centering is exact: y_t = n·x_t − Σx (integers), and ρ_k =
    // Σ y_t·y_{t+k} / Σ y_t² (the n² factors cancel). Folds run over
    // the day-sorted bounded array in POSITION order (identical on
    // both engines). Output: one row per lag with ρ_k, plus a lag-0
    // summary row carrying Q = n(n+2)·Σ ρ_k²/(n−k).
    QueryDef("q_stats_ljungbox",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .groupBy("day").agg(count(lit(1)).cast("long").as("cnt"))
        val ser = daily
          .groupBy(lit(1))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cnt").cast("long").as("sx"),
            array_sort(collect_list(struct(col("day"), col("cnt")))).as("sc"))
          .select(col("n"), col("sx"),
            expr("transform(sc, e -> CAST(n * e.cnt - sx AS DOUBLE))").as("ys"))
          .withColumn("denom",
            expr("aggregate(ys, 0.0D, (acc, y) -> acc + y * y)"))
        val lags = ser.select(col("n"), col("ys"), col("denom"),
            explode(sequence(lit(1L), lit(7L))).as("lag"))
          .withColumn("num",
            expr("""aggregate(
              zip_with(slice(ys, 1, CAST(size(ys) - lag AS INT)),
                       slice(ys, CAST(lag + 1 AS INT), CAST(size(ys) - lag AS INT)),
                       (a, b) -> a * b),
              0.0D, (acc, p) -> acc + p)"""))
          .withColumn("rho", col("num") / col("denom"))
        val summary = lags
          .groupBy(col("n"))
          .agg(array_sort(collect_list(struct(col("lag"),
            (col("rho") * col("rho")
              / (col("n") - col("lag")).cast("double")).as("term")))).as("ts"))
          .select(lit(0L).as("lag"), lit(0.0).as("rho"),
            (col("n").cast("double") * (col("n") + lit(2)).cast("double")
              * aggregate(transform(col("ts"), e => e.getField("term")),
                lit(0.0), (acc, x) => acc + x)).as("q_stat"))
        lags.select(col("lag"), col("rho"), lit(0.0).as("q_stat"))
          .unionAll(summary)
          .orderBy("lag")
      },
      """WITH daily AS (
        |  SELECT floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1),
        |ser AS (
        |  SELECT count(*)::BIGINT AS n, sum(cnt)::BIGINT AS sx,
        |    list_sort(list(struct_pack(day := day, cnt := cnt))) AS sc
        |  FROM daily),
        |ys AS (
        |  SELECT n,
        |    list_transform(sc, e -> (n * struct_extract(e, 'cnt') - sx)::DOUBLE)
        |      AS ys
        |  FROM ser),
        |den AS (
        |  SELECT n, ys,
        |    list_reduce(list_prepend(0.0, list_transform(ys, y -> y * y)),
        |      (acc, y) -> acc + y) AS denom
        |  FROM ys),
        |lags AS (
        |  SELECT n, ys, denom, unnest(range(1, 8))::BIGINT AS lag FROM den),
        |rhos AS (
        |  SELECT n, lag,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, len(ys) - lag + 1),
        |        i -> ys[i] * ys[i + lag])),
        |      (acc, p) -> acc + p) / denom AS rho
        |  FROM lags),
        |summary AS (
        |  SELECT 0::BIGINT AS lag, 0.0 AS rho,
        |    n::DOUBLE * (n + 2)::DOUBLE * list_reduce(list_prepend(0.0,
        |      list_transform(list_sort(list(struct_pack(lag := lag,
        |        term := rho * rho / (n - lag)::DOUBLE))),
        |      e -> struct_extract(e, 'term'))), (x, y) -> x + y) AS q_stat
        |  FROM rhos GROUP BY n)
        |SELECT lag, rho, 0.0 AS q_stat FROM rhos
        |UNION ALL SELECT lag, rho, q_stat FROM summary
        |ORDER BY lag""".stripMargin),

    // Embedding outliers: distance² from each vector to its OWN class
    // centroid (exact fixed-point means — the q_emb_centroid_shift
    // machinery), flagged when dist² exceeds 1.05× the class mean by
    // INTEGER cross-multiplication (20·dfx·n > 21·Σdfx — no float
    // threshold; 1.05 is calibrated to this corpus's near-uniform
    // sphere, where max/mean ≈ 1.1; a real pipeline passes the factor
    // in). Output: flagged vectors with the evidence.
    QueryDef("q_emb_outliers",
      (s, d) => {
        val cent = Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("label", "pos")
          .agg(sum(floor(col("v").cast("double") * lit(1e8)).cast("long")
              .cast("decimal(38,0)")).as("sfx"),
            count(lit(1)).cast("long").as("n"))
          .select(col("label"), col("pos"),
            (col("sfx").cast("double") / lit(1e8) / col("n").cast("double"))
              .as("c"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("cs"))
          .select(col("label"),
            expr("transform(cs, e -> e.c)").as("centroid"))
        val dists = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("embedding"))
          .join(broadcast(cent), "label")
          .select(col("vec_id"), col("label"),
            expr("""aggregate(
              zip_with(embedding, centroid,
                (v, c) -> (CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)),
              0.0D, (acc, x) -> acc + x)""").as("dist2"))
          .withColumn("dfx", floor(col("dist2") * lit(1e9)).cast("long"))
        val stats = dists.groupBy("label")
          .agg(count(lit(1)).cast("long").as("n_class"),
            sum("dfx").cast("long").as("sum_dfx"))
        dists.join(broadcast(stats), "label")
          .filter(col("dfx") * col("n_class") * lit(20) > lit(21) * col("sum_dfx"))
          .select(col("label"), col("vec_id"), col("dist2"),
            (col("dfx").cast("double") * col("n_class").cast("double")
              / col("sum_dfx").cast("double")).as("ratio"))
          .orderBy("label", "vec_id")
      },
      """WITH fx AS (
        |  SELECT label::BIGINT AS label, i AS pos,
        |    floor(embedding[i + 1]::DOUBLE * 1e8)::BIGINT AS vfx
        |  FROM embeddings, range(0, 64) t(i)),
        |per AS (
        |  SELECT label, pos,
        |    sum(vfx)::DOUBLE / 1e8 / count(*)::DOUBLE AS c
        |  FROM fx GROUP BY 1, 2),
        |cent AS (
        |  SELECT label,
        |    list_transform(list_sort(list(struct_pack(pos := pos, c := c))),
        |      e -> struct_extract(e, 'c')) AS centroid
        |  FROM per GROUP BY 1),
        |dists AS (
        |  SELECT vec_id, e.label::BIGINT AS label,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, 65),
        |        i -> (e.embedding[i]::DOUBLE - c.centroid[i])
        |           * (e.embedding[i]::DOUBLE - c.centroid[i]))),
        |      (acc, x) -> acc + x) AS dist2
        |  FROM embeddings e JOIN cent c ON e.label = c.label),
        |dfx AS (
        |  SELECT *, floor(dist2 * 1e9)::BIGINT AS dfx FROM dists),
        |stats AS (
        |  SELECT label, count(*)::BIGINT AS n_class,
        |    sum(dfx)::BIGINT AS sum_dfx
        |  FROM dfx GROUP BY 1)
        |SELECT label, vec_id, dist2,
        |  dfx::DOUBLE * n_class::DOUBLE / sum_dfx::DOUBLE AS ratio
        |FROM dfx JOIN stats USING (label)
        |WHERE dfx * n_class * 20 > 21 * sum_dfx
        |ORDER BY label, vec_id""".stripMargin),
  )
}
