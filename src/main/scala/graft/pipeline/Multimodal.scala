package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `BinaryType` columns with typed metadata alongside the
  * relational data. The Spark-side machinery here — schema, format
  * sniffing, batched per-partition decode plumbing, partitioning-aware
  * helpers — is real and tested; the actual media DECODE is a
  * clearly-marked STUB (no image/audio libraries exist in this
  * environment): [[stubDecode]] produces deterministic fake metadata
  * from the payload bytes, and [[decodeBatched]] accepts any
  * user-supplied batch decoder with the same shape a JNI/FFmpeg/Pillow
  * bridge would have.
  */
object Multimodal {

  /** Typed metadata produced by (stub) decoding. */
  case class MediaMeta(
      format: String, width: Int, height: Int,
      nFrames: Int, sampleRateHz: Int)

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("nFrames", IntegerType),
    StructField("sampleRateHz", IntegerType)))

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

  /** STUB decode ??? — deterministic fake: real systems replace this
    * with an actual decoder behind [[decodeBatched]]. Metadata is
    * derived from a hash of the payload so it is stable across runs and
    * engines-of-record, exercising the full schema/partitioning path
    * without any media library. */
  def stubDecode(bin: Column): Column = {
    val h = xxhash64(bin) // pmod handles negatives; no abs (ANSI-safe)
    struct(
      sniffFormat(bin).as("format"),
      (pmod(h, lit(1920L)) + 1).cast(IntegerType).as("width"),
      (pmod(shiftright(h, 11), lit(1080L)) + 1).cast(IntegerType).as("height"),
      (pmod(shiftright(h, 22), lit(300L)) + 1).cast(IntegerType).as("nFrames"),
      lit(16000).cast(IntegerType).as("sampleRateHz"))
  }

  /** Attach payload metadata columns (n_bytes, media struct) to a df
    * with a binary column — one narrow projection. */
  def withMediaMeta(df: DataFrame, binCol: String,
      metaCol: String = "media"): DataFrame =
    df.withColumn("n_bytes", byteLength(col(binCol)))
      .withColumn(metaCol, stubDecode(col(binCol)))

  /** Batched per-partition decode plumbing — the Scala analogue of a
    * Pandas-UDF-over-mapInPandas pipeline: rows stream through each
    * partition in `batchSize` groups, the user's `decodeBatch` sees a
    * whole batch at once (amortizing decoder/model setup, exactly like
    * an Arrow batch), and results are re-flattened 1:1. The decoder
    * runs on executors; nothing is collected.
    *
    * @param decodeBatch batch decoder: payload batch → metadata batch
    *                    (must be 1:1). The production version wraps a
    *                    real media library; tests use [[fakeBatchDecoder]].
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

  /** Deterministic fake batch decoder (the test stand-in for a real
    * decoder). */
  def fakeBatchDecoder(payloads: Seq[Array[Byte]]): Seq[MediaMeta] =
    payloads.map { b =>
      val h = math.abs(java.util.Arrays.hashCode(b).toLong)
      MediaMeta("fake", (h % 1920 + 1).toInt, (h / 1920 % 1080 + 1).toInt,
        (h % 300 + 1).toInt, 16000)
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

  /** STUB feature extraction ??? — deterministic pseudo-embedding
    * (`dim` components hashed from the payload, L2-normalized): the
    * column-level stand-in for a CLIP/wav2vec-style encoder. Real
    * systems run the model batched behind [[decodeBatched]]; the
    * output shape (unit `array<double>` alongside the row) is exactly
    * what [[Similarity]]'s ANN operators consume, so the feature →
    * index → search path is testable end-to-end without any model. */
  def stubFeatures(bin: Column, dim: Int): Column = {
    val comps = (0 until dim).map(i =>
      (pmod(xxhash64(bin, lit(i)), lit(2000001L)) - 1000000L)
        .cast("double") / 1000000.0)
    val n = sqrt(comps.map(c => c * c).reduce(_ + _))
    when(bin.isNull, lit(null).cast(ArrayType(DoubleType)))
      .otherwise(array(comps.map(c => when(n > 0, c / n).otherwise(c)): _*))
  }

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
