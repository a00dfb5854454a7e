package graft

import org.apache.spark.sql.functions._

import graft.etl.AlbFixture

/** Source/sink format coverage: the 13-column ALB relation round-trips
  * through csv and json files with explicit schemas and timestamp formats. */
class SourcesSpec extends SparkSpec {

  lazy val relation = AlbFixture.parsed(spark, sf).limit(200).cache()
  val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  test("csv round-trip preserves the relation") {
    val dir = java.nio.file.Files.createTempDirectory("albcsv").toString
    relation.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", tsFmt).csv(dir)
    val back = spark.read
      .schema(relation.schema)
      .option("header", "true").option("timestampFormat", tsFmt).csv(dir)
    assert(back.orderBy("log_source_file").collect().toSeq ==
      relation.orderBy("log_source_file").collect().toSeq)
  }

  test("json round-trip preserves the relation") {
    val dir = java.nio.file.Files.createTempDirectory("albjson").toString
    relation.write.mode("overwrite")
      .option("timestampFormat", tsFmt).json(dir)
    val back = spark.read
      .schema(relation.schema).option("timestampFormat", tsFmt).json(dir)
    assert(back.orderBy("log_source_file").collect().toSeq ==
      relation.orderBy("log_source_file").collect().toSeq)
  }

  test("orc round-trip preserves the relation") {
    val dir = java.nio.file.Files.createTempDirectory("alborc").toString
    relation.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(relation.schema).orc(dir)
    assert(back.orderBy("log_source_file").collect().toSeq ==
      relation.orderBy("log_source_file").collect().toSeq)
  }

  test("streaming file source: tumbling agg over a parquet directory == batch") {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    val ev = Tables.events(spark, sf)
    ev.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = graft.streaming.EventStreams.tumbling(stream, watermark = "1 minute")
      .writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("file_stream_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = graft.streaming.EventStreams.tumbling(ev)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("binaryFile source feeds the multimodal decode pipeline") {
    // The production ingestion path for media: spark.read.format
    // ("binaryFile") → (path, length, content) → Multimodal.decode, with
    // REAL PNG files on disk. The decode output must agree with decoding
    // the same images attached via pngPayload, proving the two ingestion
    // paths are interchangeable.
    val dir = java.nio.file.Files.createTempDirectory("binsrc")
    val ids = Seq(0L, 1L, 2L)
    ids.foreach { id =>
      val (w, h) = graft.ops.Multimodal.fixtureDims(id)
      java.nio.file.Files.write(dir.resolve(f"m$id%03d.png"),
        graft.ops.Multimodal.makePng(id, w, h))
    }
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir.toString)
      .select(
        regexp_extract(col("path"), "m(\\d+)\\.png", 1).cast("long").as("doc_id"),
        col("length"), col("content").as("payload"))
    assert(bin.count() == 3 &&
      bin.filter(col("length") =!= length(col("payload"))).isEmpty)

    val viaBinaryFile = graft.ops.Multimodal.decode(bin, "doc_id")
      .select("doc_id", "meta.width", "meta.height", "meta.pixel_sum")
      .orderBy("doc_id").collect().toSeq
    import spark.implicits._
    val viaGenerated = graft.ops.Multimodal.decode(
        graft.ops.Multimodal.pngPayload(ids.toDF("doc_id"), "doc_id"), "doc_id")
      .select("doc_id", "meta.width", "meta.height", "meta.pixel_sum")
      .orderBy("doc_id").collect().toSeq
    assert(viaBinaryFile == viaGenerated)
  }
}
