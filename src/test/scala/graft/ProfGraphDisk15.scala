package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 wall probe: the graph family PAST the ~64 GB single-box
  * residency wall, with per-round state on DISK
  * (`sbt "Test/runMain graft.ProfGraphDisk15 [factors] [reps] [queries] [mode]"`,
  * e.g. `60,100 2 q_graph_labelprop,q_graph_pagerank disk`).
  *
  * Same corpus construction as [[ProfCorpusScale13]] (factor× disjoint
  * key-shifted fact copies, one-scan crossJoin(range) shift, fresh JVM
  * per run, stage cache off). The one knob this harness adds:
  * `spark.graft.graph.roundState` (see [[graft.ops.RoundState]]) —
  * `disk` persists every round's state StorageLevel.DISK_ONLY, so the
  * iterative state and edge substrate never occupy unified storage
  * memory. Round-14 located the wall: at 60× the in-memory family
  * shows rep-to-rep spreads up to 3.2× (labelprop 169.9/325.7 s)
  * because inputs + round blocks approach half of box RAM and full
  * GCs dominate. The disk mode is the regime a >RAM box needs;
  * results + exponents live in SCALING.md §round-15.
  */
object ProfGraphDisk15 {

  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("60,100")
      .split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val queries =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Seq("q_graph_labelprop", "q_graph_pagerank")
    val mode = if (args.length > 3) args(3) else "disk"
    val baseSf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.graph.roundState", mode)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def releaseState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    def copies(df: DataFrame, factor: Int, keys: Seq[String]): DataFrame = {
      if (factor == 1) return df
      val spaces = keys.map { k =>
        k -> (df.agg(max(col(k))).head().getLong(0) + 1)
      }
      val withI = df.crossJoin(spark.range(factor).toDF("__i"))
      spaces.foldLeft(withI) { case (acc, (k, space)) =>
        acc.withColumn(k, col(k) + col("__i") * lit(space))
      }.drop("__i")
    }

    /** Graph queries only need lineitem — skip the other tables'
      * generation cost at 100×. */
    def gen(factor: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-gd15x$factor").toString
      val li = spark.read.parquet(s"$baseSf/lineitem.parquet")
      copies(li, factor, Seq("l_orderkey", "l_partkey", "l_suppkey"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      dir
    }

    for (f <- factors) {
      val t0 = System.nanoTime()
      val dir = gen(f)
      println(f"[gd15] ${f}x ($mode) generated in ${(System.nanoTime() - t0) / 1e9}%.0f s at $dir")
      queries.foreach { q =>
        val fn = SparkEntry.queries(q)
        val times = (1 to reps).map { _ =>
          val t1 = System.nanoTime()
          Bench.consume(fn(spark, dir))
          releaseState(); System.gc()
          (System.nanoTime() - t1) / 1e9
        }.sorted
        val med = times((times.size - 1) / 2)
        println(f"[gd15] ${f}x ($mode) $q: $med%.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
      def rm(root: java.nio.file.Path): Unit = {
        import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
        import java.nio.file.attribute.BasicFileAttributes
        if (!Files.exists(root)) return
        Files.walkFileTree(root, new SimpleFileVisitor[Path] {
          override def visitFile(p: Path, a: BasicFileAttributes): FileVisitResult = {
            Files.deleteIfExists(p); FileVisitResult.CONTINUE
          }
          override def postVisitDirectory(p: Path, e: java.io.IOException): FileVisitResult = {
            if (e != null) throw e
            Files.deleteIfExists(p); FileVisitResult.CONTINUE
          }
        })
      }
      rm(java.nio.file.Paths.get(dir))
    }
    spark.stop()
  }
}
