package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `BinaryType` columns with a typed metadata struct alongside. The Spark
  * side — schema, batch iteration shape, partition-local decode — is real
  * and tested; the actual codec call is STUBBED (`decodeStubBytes`) with a
  * deterministic fake because no image/audio libraries exist in this
  * container. Swapping the stub for a real decoder (e.g. TwelveMonkeys /
  * javax.imageio on the JVM) changes ONE function, not the dataflow.
  *
  * Scale notes: decode runs via `mapPartitions` so codec state is
  * initialized once per partition (not per row), the natural place for a
  * native-library handle; payload bytes never shuffle (decode-then-project
  * happens before any wide operator); metadata-only queries never touch
  * the binary column thanks to parquet column pruning.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB codec: deterministic pseudo-decode of a payload. A real
    * implementation would hand `bytes` to an image decoder; tests pin this
    * fake's exact output so the surrounding plumbing is verifiable. */
  def decodeStubBytes(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    // base-31 rolling hash mod 2^32 — matches TextAnalysis.rollingHash for
    // ASCII payloads, keeping the stub oracle-checkable end-to-end
    while (i < n) { sum = (sum * 31 + (bytes(i) & 0xff)) % 4294967296L; i += 1 }
    (n % 640 + 1, n % 480 + 1, 3, sum)
  }

  /** Attach a binary payload column derived from text (the container has no
    * real media; payload = utf-8 bytes) — stands in for `spark.read.format
    * ("binaryFile")` output at prod. */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** STUB resize: keep every `factor`-th byte. A real implementation
    * would decode, scale, re-encode; the stub is deterministic so the
    * surrounding plumbing stays oracle-checkable. */
  def resizeStubBytes(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Partition-wise resize: payload → downsampled payload + both lengths
    * and the resized payload's checksum. Same `mapPartitions` shape as
    * [[decode]] (codec state per partition; payloads never shuffle). */
  def resize(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("orig_len", LongType, nullable = false),
      StructField("resized_len", LongType, nullable = false),
      StructField("resized_checksum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val resized = resizeStubBytes(bytes, factor)
          val (_, _, _, sum) = decodeStubBytes(resized)
          Row(r.getLong(0), bytes.length.toLong, resized.length.toLong, sum)
        }
      }(enc)
  }

  /** Partition-wise decode: binary payload → metadata struct. */
  def decode(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init of (stub) codec state happens here
        rows.map { r =>
          val (w, h, c, sum) = decodeStubBytes(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), Row(w, h, c, sum))
        }
      }(enc)
  }
}
