package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY payloads
 * with typed metadata, processed batch-at-a-time inside `mapPartitions`.
 *
 * The decode step is PLUGGABLE ([[MediaDecoder]]): [[StubDecoder]] is the
 * deterministic oracle-checkable default (no third-party media libraries
 * ship in this environment); every modality also has a REAL header parser
 * on a stock JVM — [[ImageIODecoder]] (`javax.imageio`: PNG/JPEG/GIF/BMP,
 * actual container parsing and raster scaling), [[JavaSoundDecoder]]
 * (`javax.sound.sampled`: WAV/AIFF/AU headers), and [[Mp4Decoder]]
 * (byte-level ISO-BMFF box walking: ftyp brand, mvhd duration, tkhd
 * dimensions — no codec needed for the metadata pass). Everything around
 * the decoder — schema, partition-level batching, the decode→meta and
 * decode→feature signatures, the explode-based frame sampling — is
 * identical for all implementations.
 */

/** Pluggable decode SPI. Implementations MUST be serializable: instances
  * ride to executors inside the `mapPartitions` closures. Stateless
  * objects are the natural shape; a codec needing native handles should
  * lazy-init them per JVM (transient lazy val). */
trait MediaDecoder extends Serializable {
  /** Parse one payload's container: (format, width, height, durationMs). */
  def decodeMeta(modality: String, payload: Array[Byte]): (String, Int, Int, Long)

  /** Scale an image payload to (targetW, targetH), returning the re-encoded
    * bytes. Only called for `modality == "image"` rows. */
  def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte]
}

/** Deterministic pseudo-decoder — the sandbox/oracle default: metadata from
  * payload size alone, resize = strided byte downsample to a byte budget of
  * targetW*targetH/4. Fixed formulas keep every result DuckDB-replayable. */
object StubDecoder extends MediaDecoder {
  override def decodeMeta(modality: String, payload: Array[Byte]): (String, Int, Int, Long) = {
    val n = payload.length.toLong
    modality match {
      case "image" => ("png", (n % 640).toInt + 32, (n % 480).toInt + 32, 0L)
      case "audio" => ("wav", 0, 0, n * 8)
      case _ => ("mp4", (n % 1280).toInt + 64, (n % 720).toInt + 64, n * 40)
    }
  }

  override def resize(p: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val budget = targetW * targetH / 4
    if (p.length <= budget) p
    else {
      val stride = math.ceil(p.length.toDouble / budget).toInt
      val n = math.ceil(p.length.toDouble / stride).toInt
      val b = new Array[Byte](n)
      var i = 0
      while (i < n) { b(i) = p(i * stride); i += 1 }
      b
    }
  }
}

/** REAL image decoding on the JDK's own codecs (`javax.imageio`: PNG, JPEG,
  * GIF, BMP — no external dependency): `decodeMeta` reads width/height/
  * format from the actual container headers WITHOUT decoding the raster
  * (ImageReader.getWidth/getHeight are header reads), `resize` decodes,
  * scales through a Graphics2D raster op, and re-encodes as PNG. Payloads
  * no JDK reader recognizes (and non-image modalities — the JDK ships no
  * audio/video codecs) fall back to [[StubDecoder]], so a mixed corpus
  * still flows. */
object ImageIODecoder extends MediaDecoder {
  // executors are headless JVMs; the AWT raster classes only need this flag
  try System.setProperty("java.awt.headless", "true")
  catch { case _: SecurityException => }

  override def decodeMeta(modality: String, payload: Array[Byte]): (String, Int, Int, Long) =
    if (modality != "image") StubDecoder.decodeMeta(modality, payload)
    else {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext)
          StubDecoder.decodeMeta(modality, payload)
        else {
          val r = readers.next()
          r.setInput(iis)
          try (r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0), 0L)
          finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    }

  override def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) StubDecoder.resize(payload, targetW, targetH)
    else {
      val out = new java.awt.image.BufferedImage(targetW, targetH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }
}

/** REAL audio container parsing on the JDK's own `javax.sound.sampled`
  * (WAV/AIFF/AU ship with the JVM — no external dependency): `decodeMeta`
  * for audio reads the actual header — format name, channel count (reported
  * in the `width` slot), bits per sample (`height` slot), and duration from
  * frameLength/frameRate. Image rows delegate to [[ImageIODecoder]]; video
  * (no JDK codec) and unrecognized payloads fall back to [[StubDecoder]],
  * so a mixed corpus still flows through one decoder. */
object JavaSoundDecoder extends MediaDecoder {
  override def decodeMeta(modality: String, payload: Array[Byte]): (String, Int, Int, Long) =
    if (modality != "audio") ImageIODecoder.decodeMeta(modality, payload)
    else {
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val f = aff.getFormat
        val durationMs =
          if (aff.getFrameLength > 0 && f.getFrameRate > 0)
            (aff.getFrameLength * 1000L / f.getFrameRate.toLong)
          else 0L
        (aff.getType.toString.toLowerCase, f.getChannels, f.getSampleSizeInBits,
          durationMs)
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException =>
          StubDecoder.decodeMeta(modality, payload)
      }
    }

  override def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
    ImageIODecoder.resize(payload, targetW, targetH)
}

/** REAL video container parsing for MP4/ISO-BMFF — pure byte-level box
  * walking, no codec needed (the JDK ships none): `decodeMeta` for video
  * reads the actual `ftyp` major brand (format), `moov/mvhd`
  * timescale+duration (duration_ms) and the largest `trak/tkhd`
  * width×height (16.16 fixed point), handling both v0 and v1 box layouts.
  * The raster itself is never decoded — exactly the metadata pass a 100 TB
  * ingest runs. Audio delegates to [[JavaSoundDecoder]], images to
  * [[ImageIODecoder]]; non-BMFF payloads fall back to [[StubDecoder]].
  * With this, every modality has a REAL header parser on a stock JVM. */
object Mp4Decoder extends MediaDecoder {
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  /** (boxType, payloadStart, payloadEnd) for each box in [from, to). */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var p = from
    while (p + 8 <= to) {
      val size0 = u32(b, p)
      val tpe = new String(b, p + 4, 4, "ISO-8859-1")
      val (payloadStart, boxEnd) =
        if (size0 == 1L && p + 16 <= to) (p + 16, p + u64(b, p + 8))
        else if (size0 == 0L) (p + 8, to.toLong) // box extends to EOF
        else (p + 8, p + size0)
      if (boxEnd < payloadStart || boxEnd > to) return out.toSeq // malformed
      out += ((tpe, payloadStart, boxEnd.toInt))
      p = boxEnd.toInt
    }
    out.toSeq
  }

  /** None when the payload is not ISO-BMFF (no leading ftyp box). */
  private[operators] def parseMp4(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    val top = boxes(b, 0, b.length)
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    val (_, fs, fe) = top.head
    val brand = if (fe - fs >= 4) new String(b, fs, 4, "ISO-8859-1").trim else "mp4"
    var durationMs = 0L
    var w = 0
    var h = 0
    top.find(_._1 == "moov").foreach { case (_, ms, me) =>
      boxes(b, ms, me).foreach {
        case ("mvhd", ps, pe) if pe - ps >= 4 =>
          val v = b(ps) & 0xff
          if (v == 1 && pe - ps >= 32) {
            val timescale = u32(b, ps + 20)
            if (timescale > 0) durationMs = u64(b, ps + 24) * 1000L / timescale
          } else if (v == 0 && pe - ps >= 20) {
            val timescale = u32(b, ps + 12)
            if (timescale > 0) durationMs = u32(b, ps + 16) * 1000L / timescale
          }
        case ("trak", ts, te) =>
          boxes(b, ts, te).foreach {
            case ("tkhd", ps, pe) if pe - ps >= 4 =>
              val v = b(ps) & 0xff
              // v1's three u64 times/duration add 12 bytes before the matrix
              val (wo, ho) = if (v == 1) (88, 92) else (76, 80)
              if (pe - ps >= ho + 4) {
                // 16.16 fixed point; a sound trak reports 0×0 — keep the max
                val tw = (u32(b, ps + wo) >> 16).toInt
                val th = (u32(b, ps + ho) >> 16).toInt
                if (tw * th > w * h) { w = tw; h = th }
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    Some((brand, w, h, durationMs))
  }

  override def decodeMeta(modality: String, payload: Array[Byte]): (String, Int, Int, Long) =
    if (modality != "video") JavaSoundDecoder.decodeMeta(modality, payload)
    else parseMp4(payload).getOrElse(StubDecoder.decodeMeta(modality, payload))

  override def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
    ImageIODecoder.resize(payload, targetW, targetH)
}

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

  /** Kept for source compatibility: the stub formulas now live in
    * [[StubDecoder]]. */
  private[operators] def stubDecode(modality: String, payload: Array[Byte]): (String, Int, Int, Long) =
    StubDecoder.decodeMeta(modality, payload)

  /** Batch decode pass: one partition = one batch, zero shuffles. The
    * decoder ships inside the closure — pass [[ImageIODecoder]] for real
    * PNG/JPEG header parsing where codecs exist; the default keeps the
    * oracle-replayable stub. */
  def decodeMeta(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame = {
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("media_id")
        val modality = r.getAs[String]("modality")
        val payload = r.getAs[Array[Byte]]("payload")
        val (fmt, w, h, dur) = decoder.decodeMeta(modality, payload)
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
   * Resize pass for image payloads through the pluggable decoder:
   * [[StubDecoder]] (default) does a deterministic strided byte downsample
   * to a targetW*targetH/4 byte budget (oracle-replayable),
   * [[ImageIODecoder]] does a real decode→scale→re-encode. Partition-local
   * batch pass, no shuffle; output schema (media_id, width, height,
   * n_bytes, payload) is decoder-independent.
   */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    media.filter(col("modality") === "image").mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("media_id")
        val out = decoder.resize(r.getAs[Array[Byte]]("payload"), targetW, targetH)
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
