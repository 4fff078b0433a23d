package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with a
 * typed metadata struct, decoded/feature-extracted in distributed batch
 * form via `mapPartitions`.
 *
 * The actual codecs (image decode, audio resample, video frame-sample)
 * are STUBBED with a deterministic fake — this container ships no media
 * libraries — but everything Spark-side is real and tested: schema,
 * binary packing, partition-level batching, frame-sampling arithmetic,
 * and the row shape a Pandas-UDF/Arrow implementation would use.
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
}
