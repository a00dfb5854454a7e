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

  test("parquet schema evolution: mergeSchema unifies file generations") {
    // At 100 TB a table's files span schema versions (a column added last
    // quarter exists only in new files). mergeSchema must surface the
    // union schema with nulls where old files lack the column — the
    // contract that lets a pipeline evolve without rewriting history.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "score")
      .write.parquet(s"$dir/gen=2")
    val unified = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(unified.columns.toSet == Set("id", "v", "score", "gen"))
    val got = unified.select("id", "score").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(got.toSeq == Seq(1L -> None, 2L -> None, 3L -> Some(30), 4L -> Some(40)))
  }

  test("json source quarantines malformed rows in _corrupt_record") {
    // PERMISSIVE mode: bad rows must not kill a 100 TB scan — they land
    // null-columned with the raw line captured for a quarantine sink,
    // the same drop-and-count contract as the gz log parser (A13/A20).
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("badjson")
    java.nio.file.Files.write(dir.resolve("x.json"),
      Seq("""{"id": 1, "v": "ok"}""", """{"id": 2 BROKEN""",
        """{"id": 3, "v": "fine"}""").mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val rows = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    assert(rows.count() == 3)
    assert(rows.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(rows.filter(col("_corrupt_record").isNull)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
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
