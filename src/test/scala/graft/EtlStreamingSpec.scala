package graft

import org.apache.spark.sql.functions._

import graft.etl.AlbLogParser

/** The reference ETL as a restartable stream: gz logs land in a directory,
  * the SAME parser plan runs under `readStream`, results go to a parquet
  * sink with a checkpoint. Stopping and restarting the query processes
  * only new files and never duplicates output — Structured Streaming's
  * exactly-once file-sink contract, i.e. what replaces the reference's
  * rerun-everything batch loop at scale. */
class EtlStreamingSpec extends SparkSpec {

  val golden = new AlbParserSpec().golden

  def writeGz(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit = {
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(dir.resolve(name).toFile))
    out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
  }

  test("streaming parse with checkpoint: restart is incremental and exactly-once") {
    val logs = java.nio.file.Files.createTempDirectory("slogs")
    val outDir = java.nio.file.Files.createTempDirectory("sout").toString
    val cp = java.nio.file.Files.createTempDirectory("scp").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .option("pathGlobFilter", "*.gz")
        .text(logs.toString)
      val parsed = AlbLogParser.parse(stream, "value", input_file_name())
      val q = parsed.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cp)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }

    writeGz(logs, "a.log.gz", Seq(golden, "too short"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 1)

    writeGz(logs, "b.log.gz", Seq(
      golden.replace("1.2.3.4", "7.7.7.7"),
      golden.replace("1.2.3.4", "6.6.6.6")))
    runOnce()

    val rows = spark.read.parquet(outDir)
    assert(rows.count() == 3)  // incremental, no reprocessing of a.log.gz
    assert(rows.select("client_ip").orderBy("client_ip").collect()
      .map(_.getString(0)).toSeq == Seq("1.2.3.4", "6.6.6.6", "7.7.7.7"))

    // third restart with nothing new → no output change (exactly-once)
    runOnce()
    assert(spark.read.parquet(outDir).count() == 3)
  }
}
