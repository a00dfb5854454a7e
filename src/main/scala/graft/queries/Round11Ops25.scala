package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Round-11 batch 25: intra-class embedding diversity (is a class
  * redundant? — the curation signal that says "stop collecting more of
  * these") and DAU/WAU stickiness (the rolling-engagement ratio every
  * product-analytics stack reports).
  *
  * Scale shapes: diversity is CLOSED-FORM from per-class per-dim sums —
  * mean pairwise dot = (‖Σu‖² − Σ‖u‖²)/(n²−n), so the all-pairs matrix
  * never materializes (one combinable groupBy, |labels|·d model state);
  * stickiness is one (day, user) distinct plus a 7-way explode of the
  * DAY-GRANULAR frame (≤ 7·|days|·|users| rows, already deduped).
  */
object Round11Ops25 {

  val defs: Seq[QueryDef] = Seq(

    // Mean pairwise cosine within each label class, computed without
    // pairs: L2-normalize (the Similarity fold), quantize each lane to
    // micro fixed point (floor(u·1e8) — identical on both engines),
    // then meanCos = (‖S‖² − Σ‖u‖²) / (n² − n) / 1e16 where S is the
    // per-dim BIGINT sum vector. diversity = 1 − meanCos. All integer
    // until the two final divisions.
    QueryDef("q_emb_diversity",
      (s, d) => {
        val per = Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")),
            Similarity.norm(col("embedding")).as("nrm"))
          .select(col("label"), col("pos"),
            floor((col("v").cast("double") / col("nrm")) * lit(1e8))
              .cast("long").as("ufx"))
          .groupBy("label", "pos")
          .agg(sum(col("ufx").cast("decimal(38,0)")).as("sfx"),
            sum((col("ufx") * col("ufx")).cast("decimal(38,0)")).as("uu"),
            count(lit(1)).cast("long").as("n"))
        per.groupBy("label")
          .agg(max("n").cast("long").as("n"),
            sum((col("sfx") * col("sfx")).cast("decimal(38,0)")).as("s2"),
            sum("uu").as("uusum"))
          .filter(col("n") >= 2)
          .select(col("label"), col("n"),
            expr("""(CAST(s2 AS DOUBLE) - CAST(uusum AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))
              / 1e16""").as("mean_cos"))
          .withColumn("diversity", lit(1.0) - col("mean_cos"))
          .orderBy("label")
      },
      s"""WITH u AS (
        |  SELECT label::BIGINT AS label, i AS pos,
        |    floor((embedding[i + 1]::DOUBLE
        |      / sqrt(${Similarity.dotSql("embedding", "embedding")})) * 1e8)::BIGINT
        |      AS ufx
        |  FROM embeddings, range(0, 64) t(i)),
        |per AS (
        |  SELECT label, pos, sum(ufx) AS sfx, sum(ufx * ufx) AS uu,
        |    count(*)::BIGINT AS n
        |  FROM u GROUP BY 1, 2),
        |agg AS (
        |  SELECT label, max(n)::BIGINT AS n,
        |    sum(sfx * sfx) AS s2, sum(uu) AS uusum
        |  FROM per GROUP BY 1)
        |SELECT label, n,
        |  (s2::DOUBLE - uusum::DOUBLE)
        |    / (n::DOUBLE * n::DOUBLE - n::DOUBLE) / 1e16 AS mean_cos,
        |  1.0 - ((s2::DOUBLE - uusum::DOUBLE)
        |    / (n::DOUBLE * n::DOUBLE - n::DOUBLE) / 1e16) AS diversity
        |FROM agg WHERE n >= 2
        |ORDER BY label""".stripMargin),

    // DAU / WAU stickiness per day: daily active users, trailing-7-day
    // active users (each (day, user) pair projected onto the 7 windows
    // it keeps alive — a bounded explode of the ALREADY-DEDUPED
    // day-granular frame, never of raw events), and the ratio. Days
    // with fewer than 7 days of history still report (their WAU window
    // is clipped at the corpus start, as in production dashboards).
    QueryDef("q_events_stickiness",
      (s, d) => {
        val dayUser = Tables.events(s, d)
          .select(floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"), col("user_id"))
          .distinct()
        val dau = dayUser.groupBy("day")
          .agg(count(lit(1)).cast("long").as("dau"))
        val wau = dayUser
          .select(explode(sequence(col("day"), col("day") + lit(6L)))
            .as("wday"), col("user_id"))
          .distinct()
          .groupBy(col("wday").as("day"))
          .agg(count(lit(1)).cast("long").as("wau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            (col("dau").cast("double") / col("wau").cast("double"))
              .as("stickiness"))
          .orderBy("day")
      },
      """WITH day_user AS (
        |  SELECT DISTINCT floor(epoch_ms(ts) / 86400000)::BIGINT AS day,
        |    user_id
        |  FROM events),
        |dau AS (SELECT day, count(*)::BIGINT AS dau FROM day_user GROUP BY 1),
        |proj AS (
        |  SELECT DISTINCT day + k AS day, user_id
        |  FROM day_user, (SELECT unnest(range(0, 7)) AS k)),
        |wau AS (SELECT day, count(*)::BIGINT AS wau FROM proj GROUP BY 1)
        |SELECT day, dau, wau, dau::DOUBLE / wau::DOUBLE AS stickiness
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin),
  )
}
