package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY payloads
 * with typed metadata, processed batch-at-a-time inside `mapPartitions`.
 *
 * The decode step is a clearly-marked deterministic STUB (no media libraries
 * ship in this environment); everything around it — schema, partition-level
 * batching, the decode→meta and decode→feature signatures, the explode-based
 * frame sampling — is the real Spark plumbing a production decoder would
 * drop into (swap `stubDecode` for an actual codec call).
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val metaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Derive a media table from the documents fixture: payload = UTF-8 bytes,
    * modality cycles deterministically by id. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast(LongType).as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /**
   * STUB decode: deterministic pseudo-metadata from payload size alone (a
   * real implementation would parse the container/codec headers here). The
   * formulas are fixed so results are oracle-checkable.
   */
  private[operators] def stubDecode(modality: String, payload: Array[Byte]): (String, Int, Int, Long) = {
    val n = payload.length.toLong
    modality match {
      case "image" => ("png", (n % 640).toInt + 32, (n % 480).toInt + 32, 0L)
      case "audio" => ("wav", 0, 0, n * 8)
      case _ => ("mp4", (n % 1280).toInt + 64, (n % 720).toInt + 64, n * 40)
    }
  }

  /** Batch decode pass: one partition = one batch, zero shuffles. */
  def decodeMeta(media: DataFrame): DataFrame = {
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("media_id")
        val modality = r.getAs[String]("modality")
        val payload = r.getAs[Array[Byte]]("payload")
        val (fmt, w, h, dur) = stubDecode(modality, payload)
        Row(id, modality, fmt, w, h, payload.length.toLong, dur)
      }
    }(org.apache.spark.sql.Encoders.row(metaSchema))
  }

  /** STUB feature extraction: deterministic pseudo-embedding (normalized),
    * the shape a CLIP/CLAP-style encoder would produce. Feeds directly into
    * the DiskANN index build. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("media_id")
        val payload = r.getAs[Array[Byte]]("payload")
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          val h = Hash64.avalanche(Hash64.bytes(payload, 0, payload.length) + i)
          v(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
          i += 1
        }
        Row(id, graft.functions.VectorKernels.normalize(v))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * STUB resize for image payloads: deterministic byte downsampling to a
   * byte budget of targetW*targetH/4 (every `stride`-th byte, stride chosen
   * so the output fits the budget) — a real implementation decodes, scales,
   * and re-encodes here. Partition-local batch pass, no shuffle; output
   * schema (media_id, width, height, n_bytes, payload) is what a decoder
   * would produce.
   */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val budget = targetW * targetH / 4
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    media.filter(col("modality") === "image").mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("media_id")
        val p = r.getAs[Array[Byte]]("payload")
        val out =
          if (p.length <= budget) p
          else {
            val stride = math.ceil(p.length.toDouble / budget).toInt
            val n = math.ceil(p.length.toDouble / stride).toInt
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = p(i * stride); i += 1 }
            b
          }
        Row(id, targetW, targetH, out.length.toLong, out)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk of
    * the payload stands in for a decoded frame (explode keeps it columnar). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"),
        // posexplode_outer: the non-outer form makes InferFiltersFromGenerate
        // duplicate the whole chunking transform into a size()>0 filter,
        // slicing every payload twice (the chunk array is never empty here)
        posexplode_outer(transform(
          sequence(lit(0), greatest(
            (length(col("payload")) / (frameBytes * stride)).cast(IntegerType) - 1, lit(0))),
          i => call_function("substring", col("payload"), i * frameBytes * stride + 1, lit(frameBytes)))))
      .select(col("media_id"), col("pos").as("frame_idx"), col("col").as("frame"))
      .filter(col("frame").isNotNull)
}
