package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Round-11 batch 15: class-centroid shift between embedding classes
  * (the mean-embedding distance matrix — the MMD-flavored "did this
  * class move / do these sources differ?" readout) and ViT-style patch
  * extraction over the real PNG payloads.
  *
  * Scale shapes: the centroid shift reduces the corpus to |labels|×d
  * fixed-point sums with ONE combinable groupBy (the LlmOps4 kmeans
  * update shape — floor(v·1e8) summed in DECIMAL(38,0) so the
  * accumulator cannot overflow at any corpus size); the pair frame is
  * |labels|²·d, model-sized. Patchify decodes partition-local (codec
  * hoisted per partition, pixels never shuffle) and ships only
  * (id, patch coords, two longs) — the same contract as
  * q_multimodal_decode, verified per patch by the closed-form oracle.
  */
object Round11Ops15 {

  val defs: Seq[QueryDef] = Seq(

    // Pairwise distance between class mean embeddings: per (label, dim)
    // the exact fixed-point sum s = Σ floor(v·1e8) and count n; the
    // mean is (s/1e8)/n and for each label pair the squared distance
    // folds its 64 per-dim terms SORTED by dim (identical fold order on
    // both engines). 10 labels → 45 pair rows.
    QueryDef("q_emb_centroid_shift",
      (s, d) => {
        val per = Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("label", "pos")
          .agg(sum(floor(col("v").cast("double") * lit(1e8)).cast("long")
              .cast("decimal(38,0)")).as("sfx"),
            count(lit(1)).cast("long").as("n"))
        val a = per.select(col("label").as("label_a"), col("pos"),
          col("sfx").as("sa"), col("n").as("na"))
        val b = per.select(col("label").as("label_b"), col("pos"),
          col("sfx").as("sb"), col("n").as("nb"))
        a.join(b, Seq("pos"))
          .filter(col("label_a") < col("label_b"))
          .select(col("label_a"), col("label_b"), col("pos"),
            col("na"), col("nb"),
            (col("sa").cast("double") / lit(1e8) / col("na").cast("double")
              - col("sb").cast("double") / lit(1e8) / col("nb").cast("double"))
              .as("t"))
          .groupBy("label_a", "label_b")
          .agg(max("na").cast("long").as("n_a"),
            max("nb").cast("long").as("n_b"),
            array_sort(collect_list(struct(col("pos"),
              (col("t") * col("t")).as("t2")))).as("ts"))
          .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
            aggregate(transform(col("ts"), e => e.getField("t2")),
              lit(0.0), (acc, x) => acc + x).as("dist2"))
          .withColumn("dist", sqrt(col("dist2")))
          .orderBy("label_a", "label_b")
      },
      """WITH e AS (
        |  SELECT label::BIGINT AS label, i AS pos,
        |    floor(embedding[i + 1]::DOUBLE * 1e8)::BIGINT AS vfx
        |  FROM embeddings, range(0, 64) t(i)),
        |per AS (
        |  SELECT label, pos, sum(vfx) AS sfx, count(*)::BIGINT AS n
        |  FROM e GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.label AS label_a, b.label AS label_b, a.pos,
        |    a.n AS na, b.n AS nb,
        |    (a.sfx::DOUBLE / 1e8 / a.n::DOUBLE
        |      - b.sfx::DOUBLE / 1e8 / b.n::DOUBLE) AS t
        |  FROM per a JOIN per b ON a.pos = b.pos AND a.label < b.label),
        |agg AS (
        |  SELECT label_a, label_b, max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list(struct_pack(pos := pos, t2 := t * t))),
        |      e -> struct_extract(e, 't2'))), (x, y) -> x + y) AS dist2
        |  FROM pairs GROUP BY 1, 2)
        |SELECT label_a, label_b, n_a, n_b, dist2, sqrt(dist2) AS dist
        |FROM agg ORDER BY label_a, label_b""".stripMargin),

    // ViT-style 4×4 patch grid over the real decoded PNGs: one row per
    // patch with its pixel count and integer luma sum, replayed
    // pixel-for-pixel by the oracle from the fixture's closed form
    // (channel c of (x,y) in image id = (x·31 + y·7 + c·13 + id) % 256).
    QueryDef("q_multimodal_patchify",
      (s, d) => Multimodal.patchify(
          Multimodal.pngPayload(Tables.documents(s, d), "doc_id"), "doc_id", 4)
        .orderBy("doc_id", "patch_y", "patch_x"),
      """WITH dims AS (
        |  SELECT doc_id, (doc_id % 13 + 4)::INTEGER AS w,
        |    (doc_id % 11 + 3)::INTEGER AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x
        |       FROM dims),
        |xys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y
        |        FROM xs),
        |lum AS (
        |  SELECT doc_id, (y // 4)::INTEGER AS patch_y, (x // 4)::INTEGER AS patch_x,
        |    299 * ((x * 31 + y * 7 + doc_id) % 256)
        |      + 587 * ((x * 31 + y * 7 + 13 + doc_id) % 256)
        |      + 114 * ((x * 31 + y * 7 + 26 + doc_id) % 256) AS l
        |  FROM xys)
        |SELECT doc_id, patch_y, patch_x, count(*)::BIGINT AS n_px,
        |  sum(l)::BIGINT AS luma_sum
        |FROM lum GROUP BY 1, 2, 3
        |ORDER BY doc_id, patch_y, patch_x""".stripMargin),
  )
}
