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

  test("streaming JDBC load via foreachBatch: the reference sink, stream-fed") {
    // The reference appends parsed batches to MySQL; the streaming-mode
    // equivalent is foreachBatch handing each micro-batch to the SAME
    // JdbcSink.append (per-batch transactional boundary, batch id available
    // for idempotent upserts). Derby stands in for MySQL as in JdbcSinkSpec.
    val logs = java.nio.file.Files.createTempDirectory("jlogs")
    val cp = java.nio.file.Files.createTempDirectory("jcp").toString
    val url = "jdbc:derby:memory:graftstream;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")

    writeGz(logs, "a.log.gz", Seq(golden, golden.replace("1.2.3.4", "9.9.9.9")))
    val stream = spark.readStream.option("pathGlobFilter", "*.gz").text(logs.toString)
    val parsed = AlbLogParser.parse(stream, "value", input_file_name())
    val q = parsed.writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.etl.JdbcSink.append(batch, url, "elb_log_stream", props): Unit
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val loaded = spark.read.jdbc(url, "elb_log_stream", props)
    assert(loaded.count() == 2)
    assert(loaded.select("client_ip").orderBy("client_ip").collect()
      .map(_.getString(0)).toSeq == Seq("1.2.3.4", "9.9.9.9"))
  }

  test("dropDuplicatesWithinWatermark: streaming exact-dedup with bounded state") {
    // Streaming twin of Dedup.exact: duplicate records arriving across
    // micro-batches inside the watermark horizon are emitted once; state
    // is evictable once the watermark passes (bounded, unlike a plain
    // streaming dropDuplicates which must remember every key forever).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Ev]
    val t = (m: Int) => new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_stream_out")
      .outputMode("append").start()
    mem.addData(Ev(t(0), 1L, "click", 1.0), Ev(t(1), 1L, "click", 2.0)) // dup in-batch
    q.processAllAvailable()
    mem.addData(Ev(t(2), 1L, "click", 3.0), Ev(t(3), 2L, "click", 4.0)) // dup cross-batch + new
    q.processAllAvailable()
    mem.addData(Ev(t(600), 9L, "flush", 0.0)) // advance watermark, flush
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_stream_out")
      .filter(col("user_id") < 9).select("user_id", "value")
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 4.0))) // first occurrence wins, once each
  }
}
