package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `BinaryType` columns with typed metadata alongside the
  * relational data. The decode path is REAL and pure-JDK:
  * [[jdkDecode]] reads PNG/JPEG/GIF dimensions via `javax.imageio` and
  * WAV format/sample-rate via `javax.sound.sampled`, and
  * [[pixelStatsBatch]] extracts real per-channel pixel statistics —
  * no external media library needed. [[decodeBatched]] is the batched
  * per-partition seam a heavier decoder (FFmpeg/Pillow bridge, a
  * CLIP/wav2vec encoder) would plug into; [[hashFeatures]] is the
  * model-free deterministic pseudo-embedding used where no model is
  * shipped.
  */
object Multimodal {

  /** Typed metadata produced by decoding. Images: width/height set,
    * nFrames = 1, sampleRateHz = 0. Audio: width/height = 0, nFrames =
    * PCM frame count, sampleRateHz set. Undecodable: zeros. */
  case class MediaMeta(
      format: String, width: Int, height: Int,
      nFrames: Int, sampleRateHz: Int)

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("nFrames", IntegerType),
    StructField("sampleRateHz", IntegerType)))

  /** Real per-channel pixel statistics from a decoded image. */
  case class PixelStats(
      format: String, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  // ImageIO defaults to a disk-backed cache per read; executors decode
  // thousands of payloads — keep it in memory.
  ImageIO.setUseCache(false)

  /** Byte length of the payload — pushdown-friendly, no decode. */
  def byteLength(bin: Column): Column = length(bin)

  /** Container sniff from magic bytes (first bytes, hex-compared —
    * pure built-ins, codegen'd): jpeg/png/gif/riff(wav|webp)/mp4/
    * unknown. */
  def sniffFormat(bin: Column): Column = {
    val head8 = lower(hex(substring(bin, 1, 8)))
    when(bin.isNull, lit(null).cast(StringType))
      .when(head8.startsWith("ffd8ff"), "jpeg")
      .when(head8.startsWith("89504e47"), "png")
      .when(head8.startsWith("47494638"), "gif")
      .when(head8.startsWith("52494646"), "riff")
      .when(lower(hex(substring(bin, 5, 4))) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** JVM-side magic-byte sniff (the executor twin of [[sniffFormat]]). */
  def sniffBytes(b: Array[Byte]): String =
    if (b == null || b.length < 4) "unknown"
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
             b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  /** REAL pure-JDK decode: PNG/JPEG/GIF dimensions via
    * `javax.imageio.ImageIO`, WAV sample-rate/frame-count via
    * `javax.sound.sampled.AudioSystem`. Corrupt or unrecognized
    * payloads degrade to zeroed metadata rather than failing the task —
    * at 100 TB some payloads WILL be broken and one bad row must not
    * kill a 1000-executor stage. */
  def jdkDecode(b: Array[Byte]): MediaMeta = {
    val fmt = sniffBytes(b)
    try {
      fmt match {
        case "png" | "jpeg" | "gif" =>
          val img = ImageIO.read(new ByteArrayInputStream(b))
          if (img == null) MediaMeta(fmt, 0, 0, 0, 0)
          else MediaMeta(fmt, img.getWidth, img.getHeight, 1, 0)
        case "wav" =>
          val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(b))
          MediaMeta("wav", 0, 0, aff.getFrameLength,
            math.round(aff.getFormat.getSampleRate))
        case other => MediaMeta(other, 0, 0, 0, 0)
      }
    } catch { case NonFatal(_) => MediaMeta(fmt, 0, 0, 0, 0) }
  }

  /** Batch form of [[jdkDecode]] for [[decodeBatched]]. */
  def jdkBatchDecoder(payloads: Seq[Array[Byte]]): Seq[MediaMeta] =
    payloads.map(jdkDecode)

  /** REAL feature extraction: decode the image and compute per-channel
    * mean pixel values — the pure-JDK stand-in for a learned encoder,
    * with the same batch shape. Non-images yield null stats. */
  def pixelStatsBatch(payloads: Seq[Array[Byte]]): Seq[PixelStats] =
    payloads.map { b =>
      val fmt = sniffBytes(b)
      val img =
        if (fmt == "png" || fmt == "jpeg" || fmt == "gif")
          try ImageIO.read(new ByteArrayInputStream(b)) catch { case NonFatal(_) => null }
        else null
      if (img == null) PixelStats(fmt, 0, 0, 0.0, 0.0, 0.0)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        PixelStats(fmt, w, h, sr / n, sg / n, sb / n)
      }
    }

  /** Column-level decode convenience: wraps [[jdkDecode]] as a UDF.
    * Media decode is inherently JVM-object work (ImageIO readers) —
    * a UDF is the right tool here, unlike the arithmetic hot paths
    * that use native expressions. Prefer [[decodeBatched]] when the
    * decoder has per-batch setup cost to amortize. */
  private val decodeUdf = udf(jdkDecode _)

  /** Attach payload metadata columns (n_bytes, media struct with REAL
    * decoded dimensions) to a df with a binary column. */
  def withMediaMeta(df: DataFrame, binCol: String,
      metaCol: String = "media"): DataFrame =
    df.withColumn("n_bytes", byteLength(col(binCol)))
      .withColumn(metaCol, decodeUdf(col(binCol)))

  /** Batched per-partition decode plumbing — the Scala analogue of a
    * Pandas-UDF-over-mapInPandas pipeline: rows stream through each
    * partition in `batchSize` groups, the user's `decodeBatch` sees a
    * whole batch at once (amortizing decoder/model setup, exactly like
    * an Arrow batch), and results are re-flattened 1:1. The decoder
    * runs on executors; nothing is collected.
    *
    * @param decodeBatch batch decoder: payload batch → metadata batch
    *                    (must be 1:1). [[jdkBatchDecoder]] is the
    *                    shipped real implementation.
    */
  def decodeBatched[K](
      ds: Dataset[(K, Array[Byte])],
      batchSize: Int = 64)(
      decodeBatch: Seq[Array[Byte]] => Seq[MediaMeta])(
      implicit ke: Encoder[(K, MediaMeta)]): Dataset[(K, MediaMeta)] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val metas = decodeBatch(batch.map(_._2))
        require(metas.length == batch.length,
          "decodeBatch must return one result per input")
        batch.map(_._1).zip(metas)
      }
    }

  /** Synthesize a real PNG: `w`×`h`, solid RGB fill. Deterministic
    * (PNG encoding of a fixed raster is stable), so decode round-trips
    * are oracle-checkable. */
  def makePng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a real RIFF/WAVE payload: 16-bit mono PCM silence at
    * `sampleRateHz` with `nFrames` frames. */
  def makeWav(sampleRateHz: Int, nFrames: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRateHz.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Aspect-preserving fit-within resize plan — the Spark-side half of
    * a resize stage (target dims + scale as data; the pixel transform
    * itself belongs to the decoder behind [[decodeBatched]]). Pure
    * arithmetic projection; null for degenerate (≤ 0) input dims
    * rather than an ANSI divide error. */
  def resizePlan(w: Column, h: Column, maxW: Int, maxH: Int): Column = {
    val scale = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    when(w > 0 && h > 0,
      struct(
        greatest(floor(w * scale), lit(1.0)).cast(IntegerType).as("out_w"),
        greatest(floor(h * scale), lit(1.0)).cast(IntegerType).as("out_h"),
        round(scale, 6).as("scale")))
      .otherwise(lit(null))
  }

  /** Deterministic hash pseudo-embedding (`dim` components hashed from
    * the payload, L2-normalized): the model-free stand-in for a
    * CLIP/wav2vec-style encoder where no model is shipped. The output
    * shape (unit `array<double>` alongside the row) is exactly what
    * [[Similarity]]'s ANN operators consume, so the feature → index →
    * search path runs end-to-end without a model; swap in a real
    * encoder behind [[decodeBatched]] to productionize. */
  def hashFeatures(bin: Column, dim: Int): Column =
    // Native expression: ONE payload scan + dim cheap long mixes. The
    // previous composed-builtins form re-hashed the payload per
    // component AND inlined the component subtree into the norm —
    // O(payload·dim²) per row; measured 5.2 s → sub-second on the
    // sf0.1 bench for mm_features.
    graft.functions.hashFeatures(bin, dim)

  /** Frame-sampling plumbing: given per-row frame counts, emit
    * (row, frameIdx) pairs for every `stride`-th frame — the explode
    * shape a video pipeline fans out with before per-frame feature
    * extraction. */
  def sampleFrames(df: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(
        // frameless payloads (n = 0) emit NO rows, not a phantom frame 0
        when(col(nFramesCol) > 0,
          sequence(lit(0), col(nFramesCol) - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
}
