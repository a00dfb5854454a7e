package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Super-sf scale proof for the graph family (test scope:
  * `sbt "Test/runMain graft.ProfGraphScale [factors] [reps]"`,
  * e.g. `1,3,10 3`) — the round-9 sibling of [[ProfScale]] /
  * [[ProfAnnScale]] / [[ProfCurationScale]]: q_graph_triangles,
  * q_graph_kcore, and q_graph_pagerank over scaled co-order graphs.
  *
  * Two scaling regimes, because graphs have two distinct growth modes:
  *
  *  - COPIES: `factor` disjoint shifted copies of the sf0.1 lineitem
  *    (both orderkey and partkey spaces offset per copy). Nodes and
  *    edges both scale by `factor` at CONSTANT density — the scale-out
  *    regime a partitioned cluster actually faces. Expectation:
  *    runtime exponent ≈ 1 for all three ops (triangles' adjacency
  *    arrays stay the same length; peeling/pagerank state is O(nodes)).
  *
  *  - DENSE: orders multiply while the partkey space stays FIXED, so
  *    degree grows ∝ factor and the graph densifies — the adversarial
  *    regime. Triangle work is bounded by O(m^1.5); the measured
  *    exponent pins how close the adjacency-intersect plan runs to
  *    that bound (the r8 wedge join hit it with a ~50× larger
  *    constant).
  *
  * Results live in SCALING.md §measured-graph.
  */
object ProfGraphScale {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    // "copies" | "dense" | "both" — the regimes run long; splitting them
    // keeps each invocation inside a CI-friendly wall budget
    val regimes = args.lift(2).getOrElse("both") match {
      case "copies" => Seq(false)
      case "dense" => Seq(true)
      case _ => Seq(false, true)
    }
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    val base = spark.read.parquet(s"$baseSf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val maxOrder = base.agg(max("l_orderkey")).head().getLong(0) + 1
    val maxPart = base.agg(max("l_partkey")).head().getLong(0) + 1
    val maxSupp = base.agg(max("l_suppkey")).head().getLong(0) + 1
    println(s"[graph-scale] base: ${base.count()} lineitems, " +
      s"orderSpace=$maxOrder partSpace=$maxPart suppSpace=$maxSupp")

    /** factor× corpus written as `<dir>/lineitem.parquet` so the real
      * registered queries run against it unmodified (they read only the
      * three graph-bearing key columns). */
    def gen(factor: Int, dense: Boolean): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-graph$factor${if (dense) "d" else "c"}")
        .toString
      val copies = (0 until factor).map { i =>
        base.select(
          (col("l_orderkey") + lit(i * maxOrder)).as("l_orderkey"),
          (if (dense) col("l_partkey")
           else col("l_partkey") + lit(i * maxPart)).as("l_partkey"),
          (if (dense) col("l_suppkey")
           else col("l_suppkey") + lit(i * maxSupp)).as("l_suppkey"))
      }.reduce(_ union _)
      copies.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      dir
    }

    val queries = Seq("q_graph_triangles", "q_graph_kcore", "q_graph_pagerank")
    for (dense <- regimes; f <- factors) {
      val dir = gen(f, dense)
      val regime = if (dense) "dense" else "copies"
      queries.foreach { q =>
        val fn = SparkEntry.queries(q)
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          Bench.consume(fn(spark, dir))
          releaseState(); System.gc()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = times((times.size - 1) / 2) // lower median: even rep counts must not report the worse half
        println(f"[graph-scale] $regime ${f}x $q: $med%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
