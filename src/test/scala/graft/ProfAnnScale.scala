package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the k-means / ANN / semantic-dedup family
  * (test scope: `sbt "Test/runMain graft.ProfAnnScale [factors] [reps]"`,
  * e.g. `1,3,10 3`) — the ANN sibling of [[ProfScale]] (which measured
  * the dedup family the same way in round 7).
  *
  * Synthesizes embedding corpora IN-FAMILY with the driver's embeddings
  * table: same 64 dims, float components, vectors drawn around 16 latent
  * centers (so the trained K=8 quantizer has real cluster structure to
  * find) plus ~2% near-duplicates (an earlier vector + small noise — the
  * population q_dedup_semantic exists to catch), at `factor` × the sf0.1
  * vector count. Then runs q_cluster_kmeans (training cost),
  * q_similarity_ivfpq (train + encode + probe + ADC), and
  * q_dedup_semantic (train + assign + capped within-cluster join) solo —
  * median of `reps`, state released between samples, the BenchOne
  * protocol. The pinned expectation: near-linear growth (training is
  * iters × one scan; IVFPQ candidate volume is N·nprobe/K; the semantic
  * join is Σ|c|·B ≤ N·B after the anchor cap) and no OOM. Results live
  * in SCALING.md §measured-ann.
  */
object ProfAnnScale {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    val dims = 64
    val baseN = spark.read.parquet(s"$baseSf/embeddings.parquet").count().toInt
    println(s"[ann-scale] base corpus $baseN vectors × $dims dims")

    def gen(factor: Int): String = {
      val n = baseN * factor
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ann${factor}x").toString
      val rnd = new scala.util.Random(172 + factor)
      // 16 latent centers on the unit sphere-ish shell
      val centers = Array.fill(16, dims)((rnd.nextDouble() * 2 - 1).toFloat)
      val vecs = new Array[Array[Float]](n)
      var i = 0
      while (i < n) {
        if (i > 100 && rnd.nextDouble() < 0.02) {
          // near-dup: an earlier vector + small noise
          val src = vecs(rnd.nextInt(i))
          vecs(i) = src.map(v => v + (rnd.nextGaussian() * 0.01).toFloat)
        } else {
          val c = centers(rnd.nextInt(16))
          vecs(i) = c.map(v => v + (rnd.nextGaussian() * 0.15).toFloat)
        }
        i += 1
      }
      vecs.zipWithIndex.map { case (v, id) => (id.toLong, v.toSeq, id % 16) }
        .toSeq.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast("array<float>"),
          col("label").cast("int"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    val queries = Seq("q_cluster_kmeans", "q_similarity_ivfpq", "q_dedup_semantic")
    // JIT/codegen warmup on the REAL sf0.001 corpus before any timed
    // sample: the ANN plans inline literal centroid arrays and compose
    // multi-stage trainings, so their first executions are dominated by
    // whole-stage-codegen compilation — without this pass the smallest
    // factor absorbs all compile cost and the scale curve reads inverted
    // (the first 1x measurement read 32 s where the warm figure is ~2 s).
    queries.foreach { name =>
      try Bench.consume(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => }
    }
    releaseState()
    factors.foreach { f =>
      println(s"[ann-scale] ---- factor ${f}x (${baseN * f} vectors) ----")
      val dir = gen(f)
      queries.foreach { name =>
        val fn = SparkEntry.queries(name)
        val samples = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          Bench.consume(df)
          val dt = (System.nanoTime() - t0) / 1e9
          val rows = df.count()
          releaseState(); System.gc()
          (dt, rows)
        }
        val med = samples.map(_._1).sorted.apply(reps / 2)
        println(f"[ann-scale] $name%-24s ${f}x: median=$med%.2f s " +
          f"rows=${samples.head._2}%,d samples=${samples.map(s => f"${s._1}%.2f").mkString("[", ",", "]")}")
      }
    }
    spark.stop()
  }
}
