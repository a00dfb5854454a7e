package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `BinaryType` columns with a typed metadata struct alongside. The codec
  * is REAL — `javax.imageio` PNG encode/decode on the JVM, no external
  * libraries — and the fixture images are deterministic: channel `c` of
  * pixel `(x, y)` in document `id`'s image is
  * `(x*31 + y*7 + c*13 + id) mod 256`, so a SQL oracle can recompute the
  * decoded pixel sums in closed form without any image library, proving
  * the full encode → bytes → decode round trip end-to-end.
  *
  * Scale notes: decode AND encode run via `mapPartitions` so codec state
  * (the PNG [[javax.imageio.ImageReader]]/[[javax.imageio.ImageWriter]])
  * is initialized once per partition, not per row, and `dispose()`d when
  * the partition drains — the natural lifecycle for a native-library
  * handle; payload bytes never shuffle (decode-then-project happens
  * before any wide operator); metadata-only queries never touch the
  * binary column thanks to parquet column pruning.
  */
object Multimodal {

  // Process-global ImageIO config: never spill per-image scratch to /tmp.
  // Set ONCE at object load (the object initializes on each JVM — driver
  // and every executor — the first time a closure references it), not
  // inside per-partition tasks, so concurrent tasks don't repeatedly
  // mutate JVM-global state out from under other ImageIO users.
  ImageIO.setUseCache(false)

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false)))

  /** Deterministic fixture image encoded as real PNG bytes: channel `c`
    * (0=R, 1=G, 2=B) of pixel `(x, y)` is `(x*31 + y*7 + c*13 + seed) mod
    * 256`. PNG is lossless, so whatever decoder reads these bytes back
    * must reproduce exactly these values. */
  def makePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(makeImage(seed, w, h), "png", bos)
    bos.toByteArray
  }

  /** Fixture pixels without the encode step — the per-partition encode
    * paths pair this with a hoisted [[javax.imageio.ImageWriter]].
    * `seed` must be nonnegative: Scala's `%` yields negative remainders
    * for negative operands, which `setRGB` would truncate to wrapped
    * bytes while the SQL oracle sums the negative values — the closed
    * form only holds on the nonnegative domain. */
  def makeImage(seed: Long, w: Int, h: Int): BufferedImage = {
    require(seed >= 0, s"fixture seed must be nonnegative, got $seed")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = x * 31L + y * 7L + seed
        val r = (base % 256).toInt
        val g = ((base + 13) % 256).toInt
        val b = ((base + 26) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Decode PNG bytes with a caller-owned reader (reused across a
    * partition): (width, height, channels, sum of all channel values). */
  def decodePng(reader: javax.imageio.ImageReader,
                bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      sumPixels(reader.read(0))
    } finally iis.close()
  }

  private def sumPixels(img: BufferedImage): (Int, Int, Int, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, img.getColorModel.getNumColorComponents, sum)
  }

  private def newPngReader(): javax.imageio.ImageReader =
    ImageIO.getImageReadersByFormatName("png").next()

  private def newPngWriter(): javax.imageio.ImageWriter =
    ImageIO.getImageWritersByFormatName("png").next()

  /** Encode with a caller-owned writer (hoisted per partition, like the
    * reader on the decode side — no per-row writer lookup). */
  def encodePng(writer: javax.imageio.ImageWriter,
                img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { writer.setOutput(ios); writer.write(img) } finally ios.close()
    bos.toByteArray
  }

  /** Pass `it` through, invoking `close` exactly once when the partition
    * finishes — the completion hook that releases partition-hoisted codec
    * handles (`ImageReader`/`ImageWriter.dispose()`). Two triggers cover
    * every exit path: the iterator draining to `hasNext == false` (the
    * common case, releases as early as possible) AND a task-completion
    * listener, which Spark fires on success, failure, AND early
    * termination (e.g. a `limit()` that stops consuming mid-partition) —
    * without it, any non-drained exit would leak the handle. The
    * pure-Java PNG codec would survive on GC alone, but a native-library
    * swap-in would not, and this is the slot it plugs into. */
  private def closingAfter[T](it: Iterator[T])(close: () => Unit): Iterator[T] = {
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; close() }
    // null outside a task (direct unit-test invocation of the closure)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      def next(): T = it.next()
    }
  }

  /** Document-keyed fixture dims: small enough that the SQL oracle's
    * per-pixel expansion stays cheap, varied enough to catch a decoder
    * that ignores the header. */
  def fixtureDims(id: Long): (Int, Int) = {
    require(id >= 0, s"fixture doc_id must be nonnegative, got $id")
    ((id % 13 + 4).toInt, (id % 11 + 3).toInt)
  }

  /** Attach a real PNG payload per document — stands in for
    * `spark.read.format("binaryFile")` output at prod, where payloads
    * arrive as files. Encoding happens partition-local; bytes never
    * shuffle. */
  def pngPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long")).mapPartitions { rows =>
      val writer = newPngWriter() // codec state: once per partition
      closingAfter(rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = fixtureDims(id)
        Row(id, encodePng(writer, makeImage(id, w, h)))
      })(() => writer.dispose())
    }(enc)
  }

  /** Attach a binary payload column derived from text (for byte-level
    * plumbing queries that treat the payload as opaque). */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Partition-wise decode: PNG payload → metadata struct. The
    * [[javax.imageio.ImageReader]] is created once per partition and
    * reused for every row. */
  def decode(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        val reader = newPngReader() // codec state: once per partition
        closingAfter(rows.map { r =>
          val (w, h, c, sum) = decodePng(reader, r.getAs[Array[Byte]](1))
          Row(r.getLong(0), Row(w, h, c, sum))
        })(() => reader.dispose())
      }(enc)
  }

  /** Difference hash (dHash) — the classic perceptual image
    * fingerprint: sample a 9×8 luma grid (nearest neighbor, integer
    * coordinate math only — no float resampling, so the hash is
    * bit-stable across platforms), emit one bit per horizontal
    * gradient sign. Near-identical images land within a few bits of
    * Hamming distance; exact duplicates collide exactly, which makes
    * the hash a groupBy key for image dedup the same way content_md5
    * is for text. Luma is the integer BT.601 sum (299R+587G+114B). */
  def dHash(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    var bits = 0L
    var k = 0
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var prev = 0
      var x = 0
      while (x < 9) {
        val sx = x * w / 9
        val rgb = img.getRGB(sx, sy)
        val lum = ((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114
        if (x > 0) {
          if (lum > prev) bits |= (1L << k)
          k += 1
        }
        prev = lum
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Partition-wise perceptual hashing: PNG payload → dHash. Same
    * shared-codec `mapPartitions` shape as [[decode]]. */
  def phash(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        val reader = newPngReader()
        closingAfter(rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
          val img = try { reader.setInput(iis); reader.read(0) } finally iis.close()
          Row(r.getLong(0), dHash(img))
        })(() => reader.dispose())
      }(enc)
  }

  /** Nearest-neighbor downsample: out(x, y) = in(x*factor, y*factor) —
    * deterministic (no interpolation), so the resized pixel values keep
    * the fixture's closed form at stride `factor`. */
  def downsample(img: BufferedImage, factor: Int): BufferedImage = {
    val ow = (img.getWidth + factor - 1) / factor
    val oh = (img.getHeight + factor - 1) / factor
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        out.setRGB(x, y, img.getRGB(x * factor, y * factor) & 0xffffff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Partition-wise resize: decode PNG → nearest-neighbor downsample →
    * re-encode PNG → decode AGAIN, reporting the second decode's facts.
    * The double round trip means a broken encoder OR decoder fails the
    * oracle. Same `mapPartitions` shape as [[decode]]. */
  def resize(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    require(factor > 0, "resize factor must be positive")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("orig_width", IntegerType, nullable = false),
      StructField("orig_height", IntegerType, nullable = false),
      StructField("out_width", IntegerType, nullable = false),
      StructField("out_height", IntegerType, nullable = false),
      StructField("pixel_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        val reader = newPngReader()
        val writer = newPngWriter()
        closingAfter(rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
          val orig = try { reader.setInput(iis); reader.read(0) } finally iis.close()
          val small = downsample(orig, factor)
          val (w, h, _, sum) = decodePng(reader, encodePng(writer, small))
          Row(r.getLong(0), orig.getWidth, orig.getHeight, w, h, sum)
        })(() => { reader.dispose(); writer.dispose() })
      }(enc)
  }

  /** ViT-style patch extraction: decode the PNG and emit one row per
    * p×p patch (edge patches truncated) with its pixel count and the
    * integer BT.601 luma sum (299R+587G+114B) — the grid a vision
    * tokenizer feeds downstream, with integer-only math so the SQL
    * oracle can replay every patch from the fixture's closed-form
    * pixels. Same partition-hoisted reader lifecycle as [[decode]];
    * pixels never shuffle — only (id, patch coords, two longs) leave
    * the map side. */
  def patchify(df: DataFrame, idCol: String, p: Int): DataFrame = {
    require(p > 0, "patch size must be positive")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("patch_y", IntegerType, nullable = false),
      StructField("patch_x", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("luma_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        val reader = newPngReader()
        closingAfter(rows.flatMap { r =>
          val id = r.getLong(0)
          val iis = new MemoryCacheImageInputStream(
            new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val img = try { reader.setInput(iis); reader.read(0) } finally iis.close()
          val w = img.getWidth
          val h = img.getHeight
          for {
            py <- 0 until (h + p - 1) / p
            px <- 0 until (w + p - 1) / p
          } yield {
            var sum = 0L
            var n = 0L
            var y = py * p
            while (y < math.min((py + 1) * p, h)) {
              var x = px * p
              while (x < math.min((px + 1) * p, w)) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xff) * 299L +
                  ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
                n += 1
                x += 1
              }
              y += 1
            }
            Row(id, py, px, n, sum)
          }
        })(() => reader.dispose())
      }(enc)
  }
}
