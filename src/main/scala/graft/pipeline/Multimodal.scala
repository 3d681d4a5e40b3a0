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
