package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY`
  * payloads with a typed metadata struct, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Decode kernels come in two tiers. Formats the bare JRE can read get
  * REAL codecs bound through the `mapPartitions` seam: [[decodeImages]]
  * (`javax.imageio`: PNG/BMP/GIF/JPEG) and [[decodeAudio]]
  * (`javax.sound.sampled`: WAV/AIFF/AU). Formats it cannot (video, webp,
  * mp3, …) keep STUB kernels — deterministic fakes computed from the raw
  * bytes (clearly marked below) — until a JNI/FFI codec or a vectorized
  * Python worker binds at the same seam. Everything around the kernels —
  * the schema, the batch shape, the partitioning — is real Spark plumbing
  * and is what matters at 100 TB:
  *
  *  - payloads stay in one `BINARY` column (never exploded into rows), so
  *    a scan prunes them away unless the operator actually needs bytes;
  *  - decode is a narrow map (no shuffle); batches are bounded by
  *    `spark.sql.files.maxPartitionBytes`, not row counts, so a partition
  *    of 100 MB images and a partition of 100 MB thumbnails cost the same;
  *  - per-record outputs are fixed-width structs/arrays, so downstream
  *    joins/aggs are columnar and codegen'd.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("source", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap a binary payload with typed metadata. */
  def pack(df: DataFrame, id: Column, payload: Column, mime: Column, source: Column): DataFrame =
    df.select(
      id.as("id"),
      payload.as("payload"),
      struct(mime.as("mime"), source.as("source"),
        length(payload).cast("long").as("n_bytes")).as("meta"))

  /** STUB image decode: a real implementation hands `payload` to a codec.
    * The fake derives (width, height, channels) deterministically from the
    * byte length so plumbing and tests are real while the kernel is not. */
  def decodeImageStub(payload: Column): Column = {
    val n = length(payload).cast("long")
    struct(
      (pmod(n * 7919L, lit(1024L)) + 1L).as("width"),
      (pmod(n * 104729L, lit(1024L)) + 1L).as("height"),
      (pmod(n, lit(3L)) + 1L).as("channels"))
  }

  /** STUB resize: a real kernel would rescale pixels; the fake rescales
    * the stub dimensions, preserving aspect via exact integer floor
    * division (cross-engine reproducible). */
  def resizeStub(decoded: Column, maxSide: Int): Column = {
    val w = decoded.getField("width"); val h = decoded.getField("height")
    val side = greatest(w, h)
    val scaleNum = lit(maxSide.toLong)
    struct(
      when(side <= maxSide, w).otherwise(floor(w * scaleNum / side).cast("long")).as("width"),
      when(side <= maxSide, h).otherwise(floor(h * scaleNum / side).cast("long")).as("height"),
      decoded.getField("channels").as("channels"))
  }

  /** STUB feature extraction: fake `dims`-dim embedding from the payload
    * bytes (md5-seeded LCG, deterministic; all intermediates < 2^63 so the
    * math is exact on any engine); a real kernel runs a vision/audio model
    * over the decoded tensor. Output: array<double> in [0, 1). */
  def extractFeaturesStub(payload: Column, dims: Int): Column = {
    val seed = conv(substring(md5(payload), 1, 15), 16, 10).cast("long") % 1000000007L
    transform(sequence(lit(0), lit(dims - 1)),
      i => pmod(seed * 1009L + i * 9973L, lit(1000000L)).cast("double") / 1000000.0)
  }

  /** Frame sampling for "video" payloads: every `stride`-th frame index up
    * to nFrames (metadata-driven — no decode needed to plan the sample).
    * Zero or corrupt (negative) frame counts yield an empty sample, not a
    * phantom frame 0. */
  def sampleFrameIdx(nFrames: Column, stride: Int): Column =
    when(nFrames <= 0L, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), nFrames - 1L, lit(stride.toLong)))

  /** The imperative seam: run `kernel` over each partition's rows — this
    * is where a real JNI/FFI codec binds (one codec instance per
    * partition, batched I/O). The default kernel is the identity. Narrow
    * op: no shuffle, preserves partitioning. */
  def mapBinaryPartitions(
      df: DataFrame,
      schema: StructType,
      kernel: Iterator[Row] => Iterator[Row]): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions(kernel)(enc)
  }

  /** REAL image decode through the [[mapBinaryPartitions]] seam — proof
    * the seam takes an actual codec, not only the deterministic stubs.
    * `javax.imageio` is pure JVM (the JRE registers PNG/BMP/GIF/JPEG
    * readers; no native libs), so this runs on any executor. Input: a
    * [[pack]]ed frame (`id`, `payload`, `meta`); output one row per
    * payload with the decoded `width`/`height`/`channels` and `ok=false`
    * + null dims for bytes no registered reader accepts (corrupt or
    * unsupported payloads must not kill a 100 TB scan). Narrow map, no
    * shuffle; only `id`+`payload` are read, so the scan prunes `meta`. */
  def decodeImages(df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("ok", BooleanType)))
    mapBinaryPartitions(df.select(col("id"), col("payload")), out, rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val decoded =
          if (bytes == null) None
          else try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          // NonFatal, not just IOException: the JDK readers throw
          // RuntimeExceptions (AIOOBE, IllegalArgument, NegativeArraySize)
          // on fuzzed bodies behind valid magic bytes, and one bad payload
          // must not kill a 100 TB scan
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(img) =>
            Row(r.get(0), img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, true)
          case None => Row(r.get(0), null, null, null, false)
        }
      })
  }

  /** REAL audio decode through the [[mapBinaryPartitions]] seam — the
    * audio analogue of [[decodeImages]]. `javax.sound.sampled` is pure
    * JVM (the JRE registers WAV/AIFF/AU readers; no native libs). Reads
    * only the stream HEADER (`getAudioFileFormat`), never the PCM body,
    * so cost per payload is O(bytes-of-header) regardless of clip length
    * — the right shape for a 100 TB metadata sweep. Output per payload:
    * `sample_rate` (Hz), `channels`, `bits` (per sample), `n_frames`,
    * `duration_ms` (null when the container doesn't declare a frame
    * count), `ok=false` + null fields for corrupt/unsupported bytes. */
  def decodeAudio(df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("sample_rate", DoubleType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_ms", DoubleType),
      StructField("ok", BooleanType)))
    mapBinaryPartitions(df.select(col("id"), col("payload")), out, rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val header =
          if (bytes == null) None
          else try Option(javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes)))
          // NonFatal (covers UnsupportedAudioFileException + IOException):
          // malformed headers behind valid WAV/AIFF magic can throw
          // RuntimeExceptions from the JDK parsers — degrade, don't die
          catch { case scala.util.control.NonFatal(_) => None }
        header match {
          case Some(aff) =>
            val fmt = aff.getFormat
            val frames = aff.getFrameLength.toLong
            val known = frames >= 0 && fmt.getFrameRate > 0
            Row(r.get(0), fmt.getSampleRate.toDouble, fmt.getChannels,
              fmt.getSampleSizeInBits,
              if (frames >= 0) frames else null,
              if (known) frames * 1000.0 / fmt.getFrameRate else null,
              true)
          case None => Row(r.get(0), null, null, null, null, null, false)
        }
      })
  }
}
