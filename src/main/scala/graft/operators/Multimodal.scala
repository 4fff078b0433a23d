package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: media as opaque `binary` columns with a typed
 * metadata struct, decoded/feature-extracted in distributed batch form
 * via `mapPartitions` (per-partition codec setup amortizes across rows —
 * the same batch shape a `mapInPandas`/Arrow implementation uses, minus
 * the Python hop).
 *
 * The image path is a REAL codec: PNG encode/decode through
 * `javax.imageio` (JDK-standard, no external dependency), with
 * header-dims extraction, pixel aggregation, nearest-neighbor resize
 * features, and stride-based frame sampling over a length-prefixed
 * multi-frame payload. [[decodeFeatures]] remains the codec-agnostic
 * byte-stream path for formats with no JVM decoder.
 */
object Multimodal {

  /** Output schema of [[decodeFeatures]]. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("checksum", LongType),
    StructField("features", ArrayType(FloatType))))

  /**
   * Pack a string payload as an opaque binary media column with typed
   * metadata — the shape a real ingest (S3 image bytes + EXIF-ish struct)
   * would have.
   */
  def packBinary(df: DataFrame, idCol: String, payloadCol: String,
                 kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      struct(
        lit(kind).as("kind"),
        octet_length(col(payloadCol)).as("n_bytes"),
        lit("utf-8").as("codec")).as("meta"))

  /** Bytes per sampled "frame" in the stubbed decoder. */
  val FrameStride = 64

  /**
   * STUB decode: deterministic fake standing in for a real codec.
   * Real per-row work happens partition-local with no driver involvement;
   * swapping in an actual decoder only changes this function body.
   */
  def decodeStub(bytes: Array[Byte]): (Int, Long, Array[Float]) = {
    val n = bytes.length
    var checksum = 0L
    var i = 0
    while (i < n) { checksum = checksum * 31 + (bytes(i) & 0xFF); i += 1 }
    // "frame-sample": one fake feature per FrameStride bytes
    val frames = (n + FrameStride - 1) / FrameStride
    val features = Array.tabulate(math.max(frames, 0)) { f =>
      (bytes(f * FrameStride) & 0xFF).toFloat / 255.0f
    }
    (frames, checksum, features)
  }

  /**
   * Distributed decode + feature extraction over the packed frame:
   * `mapPartitions` so per-partition setup (a real decoder would open a
   * codec context once) amortizes across rows — the same batch shape
   * `mapInPandas`/Arrow uses, minus the Python hop.
   */
  def decodeFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(DecodedSchema)
    packed.select("doc_id", "media").mapPartitions { rows =>
      // per-partition "codec init" would go here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (frames, checksum, features) = decodeStub(bytes)
        Row(id, bytes.length, frames, checksum, features)
      }
    }(encoder)
  }

  // ---------------------------------------------------------------------
  // Real image codec (javax.imageio, JDK-standard)
  // ---------------------------------------------------------------------

  /**
   * Per-THREAD PNG codec arena — the buffer-reuse pass the sf5 scale
   * audit asked for: `ImageIO.read`/`ImageIO.write` per row pays a
   * plugin-registry scan, a fresh Image(In|Out)putStream whose default
   * cache is a TEMP FILE (disk I/O per row!), and a discarded reader/
   * writer instance — at 2.5× the image count that churn GC'd the codec
   * family ~3.4× harder instead of 2.5×. The arena pins one PNG
   * reader + writer + output buffer per executor THREAD (ImageReader/
   * Writer are not thread-safe; task threads are long-lived on real
   * executors and in local mode, so reuse amortizes across every task a
   * thread runs) and uses memory-cached streams throughout.
   *
   * decode() returns null on ANY undecodable payload — including a
   * truncated PNG body, which `ImageIO.read` used to THROW on — which
   * is the behavior every caller documents ("one corrupt file must not
   * fail a 100 TB pass"). encode() produces byte-identical output to
   * `ImageIO.write(img, "png", out)`: same PNGImageWriter, same default
   * write param, only the stream buffering differs.
   */
  private final class PngArena {
    javax.imageio.ImageIO.setUseCache(false) // static + idempotent
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val buf = new java.io.ByteArrayOutputStream(8 << 10)
    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      if (bytes == null) return null
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true) // seekForwardOnly, ignoreMetadata
        reader.read(0)
      } catch { case scala.util.control.NonFatal(_) => null }
      finally iis.close()
    }
    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      buf.reset()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
      try { writer.setOutput(ios); writer.write(img) }
      finally { ios.close(); writer.setOutput(null) }
      buf.toByteArray
    }
  }
  private val pngArena = new ThreadLocal[PngArena] {
    override def initialValue(): PngArena = new PngArena
  }
  private def decodePng(bytes: Array[Byte]): java.awt.image.BufferedImage =
    pngArena.get().decode(bytes)
  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] =
    pngArena.get().encode(img)

  /** Grayscale value of pixel (x, y) of the synthetic image for `docId` —
   * shared by the renderer, the decode verifier, and (in SQL form) the
   * external oracle: every row y is the constant (docId + y) mod 256. */
  def referencePixel(docId: Long, x: Int, y: Int): Int =
    ((docId + y) % 256).toInt

  /** Dimensions of the synthetic image for `docId` (SQL-derivable). */
  def referenceDims(docId: Long): (Int, Int) =
    (16 + (docId % 16).toInt, 8 + (docId % 8).toInt)

  /** Deterministic synthetic PNG whose dims and pixels are pure
   * functions of the id — real bytes through the real PNG encoder, so
   * decoding them exercises the actual codec, while an external oracle
   * can still predict every decoded value from the id alone. */
  def renderPng(docId: Long): Array[Byte] = {
    val (w, h) = referenceDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val g = referencePixel(docId, 0, y)
      val rgb = (g << 16) | (g << 8) | g
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** One synthetic PNG per row, packed as the opaque binary media column
   * (what an ingest of real image files lands as). Rendering runs
   * distributed in `mapPartitions` — the driver never sees a pixel. */
  def packImages(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, renderPng(id))))
      .toDF("doc_id", "media")
      .withColumn("meta", struct(
        lit("image/png").as("kind"),
        octet_length(col("media")).as("n_bytes"),
        lit("png").as("codec")))
  }

  /** Output schema of [[imageFeatures]]. */
  val ImageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", IntegerType),
    StructField("pixel_sum", LongType),
    StructField("px_ok", BooleanType),
    StructField("features", ArrayType(FloatType))))

  /**
   * REAL image decode + feature extraction: `ImageIO.read` parses the
   * PNG, dims come from the decoded header, `pixel_sum` aggregates the
   * gray channel (order-independent, so deterministic), `features` is a
   * nearest-neighbor `resizeW`×`resizeH` luma thumbnail — the standard
   * embed-ready downsample. Pass `verifyPixel` to additionally check
   * every decoded pixel against an expected-value function (`px_ok`):
   * the encode→decode roundtrip through the actual codec is then
   * content-verified, not assumed. Null/undecodable media yields a
   * null-dims row rather than killing the job (one corrupt file must
   * not fail a 100 TB pass).
   */
  def imageFeatures(packed: DataFrame, resizeW: Int = 4, resizeH: Int = 4,
                    verifyPixel: Option[(Long, Int, Int) => Int] = None): DataFrame = {
    val spark = packed.sparkSession
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(ImageSchema)
    packed.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null) null
          else decodePng(bytes)
        if (img == null) Row(id, null, null, null, null, false, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var ok = true
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = img.getRGB(x, y) & 0xFF
              sum += g
              verifyPixel.foreach(f => ok &&= f(id, x, y) == g)
              x += 1
            }
            y += 1
          }
          val features = Array.tabulate(resizeH * resizeW) { i =>
            val (ry, rx) = (i / resizeW, i % resizeW)
            (img.getRGB(rx * w / resizeW, ry * h / resizeH) & 0xFF) / 255.0f
          }
          Row(id, w, h, w * h, sum, ok, features)
        }
      }
    }(encoder)
  }

  // ---------------------------------------------------------------------
  // Multi-frame payloads (video shape): length-prefixed PNG frames
  // ---------------------------------------------------------------------

  /** Frame count of the synthetic clip for `docId` (SQL-derivable). */
  def referenceFrameCount(docId: Long): Int = 1 + (docId % 4).toInt

  /** Constant gray value of frame `f` of the clip for `docId`. */
  def referenceFrameValue(docId: Long, f: Int): Int =
    ((docId * 7 + f * 11) % 256).toInt

  /** Render one 4×4 constant-gray frame. */
  def renderFramePng(docId: Long, f: Int): Array[Byte] = {
    val g = referenceFrameValue(docId, f)
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < 4) { var x = 0; while (x < 4) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    encodePng(img)
  }

  /** Length-prefixed concatenation: [int32 len][png bytes] per frame —
   * the framing a container-less clip payload needs so a reader can
   * SKIP unsampled frames without decoding them. */
  def packFrames(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = referenceFrameCount(id)
        val bos = new java.io.ByteArrayOutputStream()
        val dos = new java.io.DataOutputStream(bos)
        (0 until n).foreach { f =>
          val b = renderFramePng(id, f)
          dos.writeInt(b.length)
          dos.write(b)
        }
        (id, n, bos.toByteArray)
      })
      .toDF("doc_id", "n_frames", "media")
      .withColumn("meta", struct(
        lit("video/x-png-frames").as("kind"),
        octet_length(col("media")).as("n_bytes"),
        col("n_frames")))
  }

  /** Output schema of [[sampleFrames]]. */
  val FrameSampleSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", IntegerType),
    StructField("n_sampled", IntegerType),
    StructField("sampled_sum", LongType)))

  /**
   * Stride frame-sampling with REAL decode of only the sampled frames:
   * the framing lets unsampled frames be skipped byte-wise (at scale
   * that skip is the entire point — decode cost scales with the sample,
   * not the clip). Each sampled frame is decoded with `ImageIO.read`
   * and summarized by its (0,0) gray value. Null media, corrupt framing
   * (negative/oversized length prefix), or an undecodable sampled frame
   * yields a null-counts row — one bad clip must not fail a 100 TB pass.
   */
  def sampleFrames(packed: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = packed.sparkSession
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(FrameSampleSchema)
    packed.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Row(id, null, null, null)
        else try {
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(bytes))
          var f = 0
          var sampled = 0
          var sum = 0L
          while (in.available() >= 4) {
            val len = in.readInt()
            if (len < 0 || len > in.available())
              throw new java.io.IOException(s"corrupt frame length $len")
            if (f % stride == 0) {
              val b = new Array[Byte](len)
              in.readFully(b)
              val img = decodePng(b)
              if (img == null)
                throw new java.io.IOException(s"undecodable frame $f")
              sum += (img.getRGB(0, 0) & 0xFF)
              sampled += 1
            } else {
              in.skipBytes(len) // unsampled frame: never decoded
            }
            f += 1
          }
          Row(id, f, sampled, sum)
        } catch {
          case scala.util.control.NonFatal(_) => Row(id, null, null, null)
        }
      }
    }(encoder)
  }

  // ---------------------------------------------------------------------
  // Perceptual hashing (image near-dup)
  // ---------------------------------------------------------------------

  /** Output schema of [[dHash]]. */
  val DHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dhash", LongType)))

  /**
   * Perceptual difference-hash (dHash) over the decoded pixel grid —
   * the standard 64-bit image fingerprint for near-duplicate detection:
   * decode, nearest-neighbor resize to a (gridW+1)×gridH luma grid (the
   * [[imageFeatures]] resize kernel), and set bit `y·gridW + x` when the
   * right pixel is brighter than its left neighbor. Horizontal GRADIENT
   * signs survive exactly the transforms that defeat byte-level dedup —
   * re-encode, resize, brightness/contrast shift — which is why a
   * crawl-scale image pipeline dedups on this hash, not on content
   * bytes. Map-only (`mapPartitions`, decode cost scales with the scan);
   * null/undecodable media yields a null hash instead of killing a
   * 100 TB pass. Near-dup = small Hamming distance: feed the output to
   * [[imageNearDup]].
   */
  def dHash(packed: DataFrame, gridW: Int = 8, gridH: Int = 8): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64,
      s"dHash grid ${gridW}x$gridH must fit 64 bits")
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(DHashSchema)
    packed.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null) null
          else decodePng(bytes)
        if (img == null) Row(id, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          // nearest-neighbor sample of the (gridW+1) x gridH luma grid
          // (identity when the image is already that size)
          def px(gx: Int, gy: Int): Int =
            img.getRGB(gx * w / (gridW + 1), gy * h / gridH) & 0xFF
          var hash = 0L
          var gy = 0
          while (gy < gridH) {
            var gx = 0
            while (gx < gridW) {
              if (px(gx + 1, gy) > px(gx, gy))
                hash |= 1L << (gy * gridW + gx)
              gx += 1
            }
            gy += 1
          }
          Row(id, hash)
        }
      }
    }(encoder)
  }

  /**
   * Image near-duplicate pairs: banded Hamming self-join over
   * [[dHash]] fingerprints, reusing [[Dedup.simhashPairs]]' Manku-style
   * blocked candidate scheme (≤ maxHamming differing bits must leave
   * some 3 of maxHamming+3 blocks untouched — lossless, linear
   * candidates, never all-pairs). Null-hash rows (undecodable media)
   * are excluded: they can match nothing.
   */
  def imageNearDup(hashed: DataFrame, idCol: String,
                   maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      hashed.filter(col("dhash").isNotNull)
        .select(col(idCol), col("dhash").as("simhash")),
      idCol, maxHamming)

  /** Reference 60-bit content hash of the near-dup image fixture for
   * `docId`: md5 of the CONTENT CLASS (docId/8 — eight consecutive ids
   * share a base image, so duplicate GROUPS scale with the corpus while
   * group SIZES stay fixed, the ScaleData growth axis), with bit
   * (docId%8) flipped per member — intra-class pairs land at Hamming 2,
   * cross-class pairs at ~30 (md5-random). 15 hex chars = 60 bits keeps
   * the value inside a signed long for both engines' hex casts. */
  def referenceDHash(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((docId / 8).toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) ^ (1L << (docId % 8).toInt)
  }

  /** Render the fixture image whose [[dHash]] is exactly
   * [[referenceDHash]]: a 9×8 PNG where each row is a ±1 luma random
   * walk from 128 — step up where the hash bit is set, down where it
   * isn't — so the horizontal gradient SIGNS encode the hash and the
   * real decode→resize→compare path recovers it bit-for-bit (bits ≥ 60
   * are 0: the walk steps down). Real bytes through the real PNG codec,
   * id-predictable content — the q_multimodal oracle convention. */
  def renderDHashPng(docId: Long): Array[Byte] = {
    val hash = referenceDHash(docId)
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      var x = 0
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      while (x < 8) {
        v += (if ((hash >>> (y * 8 + x) & 1L) == 1L) 1 else -1)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** One near-dup fixture PNG per row, packed as the opaque media
   * column (the [[packImages]] shape; rendering is distributed). */
  def packDHashImages(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, renderDHashPng(id))))
      .toDF("doc_id", "media")
      .withColumn("meta", struct(
        lit("image/png").as("kind"),
        octet_length(col("media")).as("n_bytes"),
        lit("png").as("codec")))
  }

  /** Output schema of [[patchify]]. */
  val PatchSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("patch_x", IntegerType),
    StructField("patch_y", IntegerType),
    StructField("patch_sum", LongType)))

  /**
   * ViT-style patch extraction: decode the image once, tile it into a
   * `patchW`×`patchH` grid (partial edge tiles dropped — the standard
   * crop-to-grid), one output row per patch summarized by its exact
   * gray-channel sum (order-independent ⇒ deterministic; a downstream
   * embedder consumes patch tensors the same flattened way). The
   * corpus-side fan-out is rows × patches with NO shuffle — patch rows
   * are born in the partition that decoded their image. Null or
   * undecodable media contributes nothing (one corrupt file must not
   * fail a 100 TB pass; the decode gate q_multimodal reports those).
   */
  def patchify(packed: DataFrame, patchW: Int = 8, patchH: Int = 4): DataFrame = {
    require(patchW >= 1 && patchH >= 1, s"bad patch dims ${patchW}x$patchH")
    val spark = packed.sparkSession
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(PatchSchema)
    packed.select("doc_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null) null
          else decodePng(bytes)
        if (img == null) Iterator.empty
        else {
          val nx = img.getWidth / patchW
          val ny = img.getHeight / patchH
          for {
            py <- Iterator.range(0, ny)
            px <- Iterator.range(0, nx)
          } yield {
            var sum = 0L
            var y = py * patchH
            while (y < (py + 1) * patchH) {
              var x = px * patchW
              while (x < (px + 1) * patchW) {
                sum += (img.getRGB(x, y) & 0xFF)
                x += 1
              }
              y += 1
            }
            Row(id, px, py, sum)
          }
        }
      }
    }(encoder)
  }

  // ---------------------------------------------------------------------
  // Audio (PCM16): frame energy / peak / silence gating
  // ---------------------------------------------------------------------

  /** Sample count of the synthetic clip for `docId` (SQL-derivable);
   * NOT a multiple of [[AudioFrameLen]], so partial tail frames exist
   * and the framer's short-frame path is always exercised. */
  def referenceSampleCount(docId: Long): Int = (192 + docId % 192).toInt

  /** PCM sample k of the synthetic clip for `docId` — shared by the
   * renderer, the decode verifier, and (in SQL form) the external
   * oracle. Two silence axes: docs with id ≡ 0 (mod 8) are QUIET
   * throughout (amplitude 32 — every frame lands under the gate), and
   * every doc goes quiet on frames where (id + frame) ≡ 0 (mod 4) — so
   * clips interleave voiced RUNS with silent gaps and the segment
   * extractor has real islands to find. Arithmetic is modular plus one
   * NONNEGATIVE integer division (k/frameLen, where floor == trunc —
   * negative operands, where the two conventions split, never occur). */
  def referenceSample(docId: Long, k: Int): Int = {
    val base = docId * 7 + k.toLong * k
    val frame = k / AudioFrameLen
    if (docId % 8 == 0 || (docId + frame) % 4 == 0) (base % 64 - 32).toInt
    else (base % 4096 - 2048).toInt
  }

  /** Samples per analysis frame. */
  val AudioFrameLen = 64

  /** Silence gate: a frame is silent when mean square < 100² (RMS below
   * 100 full-scale-int16 units) — integer-exact as energy < n·10⁴. */
  val SilenceMeanSquare = 10000L

  /** One synthetic PCM16 little-endian clip per row, packed as the
   * opaque binary media column. Rendering runs distributed in
   * `mapPartitions` — the driver never sees a sample. */
  def packPcm(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = referenceSampleCount(id)
        val bytes = new Array[Byte](n * 2)
        var k = 0
        while (k < n) {
          val s = referenceSample(id, k)
          bytes(2 * k) = (s & 0xFF).toByte
          bytes(2 * k + 1) = ((s >> 8) & 0xFF).toByte
          k += 1
        }
        (id, bytes)
      })
      .toDF("doc_id", "media")
      .withColumn("meta", struct(
        lit("audio/pcm").as("kind"),
        octet_length(col("media")).as("n_bytes"),
        lit("pcm_s16le").as("codec")))
  }

  /** Output schema of [[audioFrames]]. */
  val AudioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("energy", LongType),
    StructField("peak", IntegerType),
    StructField("silent", BooleanType)))

  /**
   * Audio feature extraction over the packed PCM16 payload: decode the
   * little-endian samples, window into [[AudioFrameLen]]-sample frames
   * (the tail frame keeps its true short length), and emit per-frame
   * energy (Σs², exact long), peak (max |s|) and a silence flag
   * (mean square under [[SilenceMeanSquare]]) — the VAD-style front end
   * a speech-data pipeline runs before anything expensive, and the
   * audio leg of the multimodal family: every output is INTEGER
   * arithmetic over decoded bytes, so the external oracle certifies the
   * full decode→frame→aggregate path analytically with zero float
   * tolerance. `mapPartitions` like the image codec (per-partition
   * decoder setup amortizes; one corrupt/odd-length payload yields a
   * null-features row, never a failed 100 TB pass).
   */
  def audioFrames(packed: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(AudioSchema)
    packed.select("doc_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.length % 2 != 0)
          Iterator(Row(id, null, null, null, null, null))
        else {
          val n = bytes.length / 2
          val nFrames = (n + AudioFrameLen - 1) / AudioFrameLen
          Iterator.tabulate(nFrames) { f =>
            val from = f * AudioFrameLen
            val until = math.min(n, from + AudioFrameLen)
            var energy = 0L
            var peak = 0
            var k = from
            while (k < until) {
              // PCM16LE: low byte unsigned, high byte signed
              val s = ((bytes(2 * k) & 0xFF) | (bytes(2 * k + 1) << 8)).toShort.toInt
              energy += s.toLong * s
              val a = math.abs(s)
              if (a > peak) peak = a
              k += 1
            }
            val len = until - from
            Row(id, f, len, energy, peak,
              energy < len * SilenceMeanSquare)
          }
        }
      }
    }(encoder)
  }

  /**
   * Silence-trimmed voiced segments: maximal runs of consecutive
   * NON-silent frames per clip — what a speech pipeline actually
   * forwards to transcription/embedding (the silence between utterances
   * is cost, not content). Consumes [[audioFrames]] output; the run
   * grouping is the classic islands transform (frame − row_number over
   * voiced frames is constant within a run), one window partitioned by
   * clip — per-partition state is a clip's frame count — plus one
   * groupBy. Per segment: first frame, frame count, summed exact
   * energy. Null-feature rows (undecodable payloads) drop here: no
   * frames, no segments.
   */
  def speechSegments(frames: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("frame"))
    frames
      .filter(col("silent") === false)
      .withColumn("_grp", col("frame") - row_number().over(w))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("frame")).as("seg_start"),
        count(lit(1)).cast("int").as("n_frames"),
        sum(col("energy")).as("energy"))
      .drop("_grp")
  }
}
