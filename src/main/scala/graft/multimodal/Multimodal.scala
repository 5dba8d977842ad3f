package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark side — schema, partitioning, batch shape,
  * feature-column layout — is real and tested; the DECODE step is a
  * clearly-marked deterministic stub (`DecoderStub`), because no media
  * libraries exist in this container. Swapping in a real decoder (JNI
  * ffmpeg/libjpeg, or a Python `mapInPandas` stage in a PySpark deployment)
  * touches only `DecoderStub`.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, bytes: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(media_id: Long, modality: String,
                           feature: Array[Float], n_frames: Int)

  /** STUB decoder — deterministic fake. A real implementation decodes
    * `bytes` (image pixels / audio PCM / video frames); this derives a
    * stable feature vector from the byte content so the pipeline is
    * end-to-end testable and reproducible.
    */
  object DecoderStub {
    def decodeAndFeaturize(bytes: Array[Byte], dim: Int): Array[Float] = {
      // ??? real decode goes here; deterministic fake below
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var j = 0
      while (j < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
        out(j) = (h % 1000).toFloat / 1000.0f
        j += 1
      }
      out
    }

    def frameSample(bytes: Array[Byte], everyN: Int): Int =
      math.max(1, bytes.length / math.max(1, everyN))
  }

  /** Feature extraction over the binary column. Executed as a typed
    * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator of
    * rows per partition — a real decoder amortizes codec init per
    * partition, exactly like a pandas-batch UDF). Input is size-balanced
    * first: binary payloads skew (a video row is 1000× an image row), so
    * repartition by a byte-size-salted key to spread heavy rows.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
                      partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    media
      .repartition(n, pmod(xxhash64(col("media_id")), lit(n)))
      .mapPartitions { it =>
        // per-partition init of the (stub) codec happens here
        it.map { m =>
          MediaFeatures(m.media_id, m.modality,
            DecoderStub.decodeAndFeaturize(m.bytes, dim),
            DecoderStub.frameSample(m.bytes, 1024))
        }
      }
  }

  /** Resize PLANNING (the metadata half of a resize stage — real Spark
    * arithmetic, codegen'd): target dimensions bounded by `maxDim` with
    * aspect ratio preserved, never upscaled. The pixel resampling itself
    * belongs behind the decoder seam like every other byte-level op.
    */
  def resizePlan(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim.toDouble) /
      greatest(col("width"), col("height")).cast("double"))
    df.withColumn("out_w", greatest(lit(1), round(col("width") * scale).cast("int")))
      .withColumn("out_h", greatest(lit(1), round(col("height") * scale).cast("int")))
  }

  /** Deterministic synthetic media table (binary payloads derived from ids)
    * for tests/benches — no external data.
    */
  def syntheticMedia(spark: SparkSession, rows: Long, seed: Long = 42): Dataset[MediaRow] = {
    import spark.implicits._
    val df = spark.range(rows).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("id"), lit(seed)), lit(3)) + 1).cast("int")).as("modality"),
      sha2(concat(lit("media"), col("id").cast("string")), 512).cast("binary").as("bytes"),
      (pmod(xxhash64(col("id"), lit(seed + 1)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col("id"), lit(seed + 2)), lit(1080)) + 1).cast("int").as("height"),
      pmod(xxhash64(col("id"), lit(seed + 3)), lit(600000)).as("duration_ms"))
    df.as[MediaRow]
  }
}
