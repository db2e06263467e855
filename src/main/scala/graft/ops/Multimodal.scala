package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction run batch-wise over partitions.
  *
  * The Spark-side structure — schema, partitioning, batch shape — is real
  * and tested; the actual media decode is a clearly marked STUB (this
  * container has no image/audio libraries), producing deterministic fake
  * features so the pipeline is end-to-end verifiable. Swapping in a real
  * decoder touches only [[stubDecode]].
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata struct to each row
    * (here the payload is the UTF-8 text itself — in production it's the
    * image/audio bytes read from object storage).
    */
  def attachBinary(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        length(col("content")).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        sha2(col("content"), 256).as("sha256")))

  final case class MediaRow(id: Long, content: Array[Byte])
  final case class MediaFeatures(id: Long, n_bytes: Int, brightness: Double, feature: Array[Float])

  /** STUB decode: deterministic fake "feature extraction" from raw bytes.
    * Stands in for image decode + resize + embed; same signature and batch
    * shape a real decoder would have.
    */
  def stubDecode(bytes: Array[Byte], dim: Int): (Double, Array[Float]) = {
    var h = 1125899906842597L // deterministic LCG from content
    var i = 0
    var sum = 0L
    while (i < bytes.length) { h = 31 * h + bytes(i); sum += bytes(i) & 0xff; i += 1 }
    val brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0
    val feat = new Array[Float](dim)
    i = 0
    var s = h
    while (i < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      feat(i) = ((s >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
      i += 1
    }
    (brightness, feat)
  }

  final case class ResizedMedia(id: Long, width: Int, height: Int, pixels: Array[Byte])
  final case class Frame(id: Long, frameIdx: Int, offset: Long, length: Int, sha8: String)

  /** STUB resize: deterministic fake wxh grayscale "thumbnail" derived from
    * the content bytes. Stands in for image decode+resize; output schema
    * and batch shape are what a real thumbnailer produces.
    */
  def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var s = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) { s = s * 31 + bytes(i); i += 1 }
    i = 0
    while (i < out.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  /** Frame sampling plumbing: pick `nFrames` evenly spaced byte-range
    * "frames" from an opaque video payload. The ranges and digests are
    * real; a production decoder replaces the range arithmetic with
    * keyframe offsets.
    */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame, // (id: long, content: binary)
      nFrames: Int,
      batchSize: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { m =>
            val n = math.max(1, math.min(nFrames, m.content.length))
            val step = math.max(1, m.content.length / n)
            (0 until n).map { f =>
              val off = (f * step).toLong
              val len = math.min(step, m.content.length - off).toInt
              val md = java.security.MessageDigest.getInstance("SHA-256")
              md.update(m.content, off.toInt, math.max(len, 0))
              val sha8 = md.digest().take(4).map("%02x".format(_)).mkString
              Frame(m.id, f, off, len, sha8)
            }
          }
        }
      }
  }

  /** Batch resize over partitions (same mapInPandas-shaped plumbing). */
  def resizeAll(
      spark: SparkSession,
      media: DataFrame,
      w: Int,
      h: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map(m =>
          ResizedMedia(m.id, w, h, stubResize(m.content, w, h))))
      }
  }

  /** Batch feature extraction over partitions — the Scala analogue of a
    * `mapInPandas` decode UDF: rows are processed in bounded batches
    * (vectorized-decoder shape), output is a typed Dataset, partitioning of
    * the input is preserved (no shuffle).
    */
  def extractFeatures(
      spark: SparkSession,
      media: DataFrame, // needs (id: long, content: binary)
      dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch => // batch boundary = where a real decoder vectorizes
          batch.map { m =>
            val (brightness, feat) = stubDecode(m.content, dim)
            MediaFeatures(m.id, m.content.length, brightness, feat)
          }
        }
      }
  }
}
