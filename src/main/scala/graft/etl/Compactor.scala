package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the maintenance operation every long-running
  * 100 TB pipeline needs: streaming sinks, frequent small batch appends,
  * and over-parallel writers all produce directories of tiny parquet
  * files whose per-file open/footer cost dominates later scans.
  *
  * Strategy: size the output file count from the ACTUAL input bytes
  * (parquet→parquet recompression is roughly size-preserving), then
  * `repartitionByRange` on the caller's sort keys — a range shuffle keyed
  * by a distributed sample, so output files hold disjoint key ranges —
  * and sort within partitions so parquet row-group min/max statistics
  * support predicate pushdown on the compacted layout. With no sort keys
  * a plain round-robin `repartition` balances bytes instead.
  */
object Compactor {

  /** Compact the parquet directory `inDir` into `outDir` with files of
    * roughly `targetFileMB` each. Returns the number of files written.
    *
    * Driver work is one file-system listing (to size the job) — the data
    * path is a single distributed shuffle + write, no collect.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileMB: Int = 512,
                     sortCols: Seq[String] = Nil): Int = {
    require(targetFileMB > 0, "target file size must be positive")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var bytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1L,
      math.ceil(bytes.toDouble / (targetFileMB.toLong << 20)).toLong).toInt
    val df = spark.read.parquet(inDir)
    val sized =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    sized.write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
