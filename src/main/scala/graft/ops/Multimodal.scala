package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY`
  * payloads with a typed metadata struct, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Decode kernels come in three tiers.
  *
  *  1. JRE codecs, REAL full decode: [[decodeImages]] (`javax.imageio`:
  *     PNG/BMP/GIF/JPEG) and [[decodeAudio]] (`javax.sound.sampled`:
  *     WAV/AIFF/AU headers).
  *  2. Hand-written container/frame parsers, REAL metadata extraction
  *     from the public format specs — no codec library needed:
  *     [[probeVideo]] (MP4/ISO-BMFF box tree → brand, duration, dims,
  *     track count), [[probeMp3]] (MPEG frame header → bitrate, sample
  *     rate, channels, CBR duration), [[probeWebp]] (RIFF VP8/VP8L/VP8X
  *     → format, dims). This is the ffprobe-style tier a training-data
  *     sweep actually runs at 100 TB.
  *  3. Pixel/PCM kernels, REAL for JRE-decodable formats:
  *     [[resizeImages]] (ImageIO decode → bilinear `Graphics2D` scale →
  *     PNG re-encode), [[extractImageFeatures]] (channel means, mean
  *     luminance, luminance-histogram entropy — blank/low-contrast
  *     screens), [[extractAudioFeatures]] (PCM RMS / peak /
  *     zero-crossing rate over a bounded frame budget — silence and
  *     clipping screens). For non-JRE codecs (VP8 bitstream, MP3
  *     synthesis, H.264 frames) and model embeddings this tier is an
  *     EXTERNAL BINDING at the same [[mapBinaryPartitions]] seam — the
  *     full contract a binding must satisfy (schemas, batching, error
  *     policy, determinism) is `MULTIMODAL_SEAM.md`, with the codecs in
  *     this file as its reference implementations. This build
  *     environment has no codec route to bind (no ffmpeg/PIL/JNI libs
  *     on the image — verified), so the `decode*Stub` /
  *     `extractFeaturesStub` CONTRACT TWINS stand in for exactly that
  *     tier: deterministic arithmetic over payload bytes, reproducible
  *     in any engine, which is what lets the DuckDB oracle attest the
  *     plumbing end-to-end (q34 is a green oracle row).
  *
  * Everything around the kernels —
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

  /** The shared per-payload kernel scaffold all codec operators build
    * on: `parse` maps raw bytes to the row's non-id field values; a null
    * payload, a `None`, or ANY NonFatal throw degrades to an all-null
    * row with `ok=false`. NonFatal, not just IOException: the JDK
    * readers throw RuntimeExceptions (AIOOBE, IllegalArgument,
    * NegativeArraySize) on fuzzed bodies behind valid magic bytes, and
    * one bad payload must not kill a 100 TB scan. The degradation
    * contract lives HERE, once. `out`'s layout is (id, fields..., ok). */
  private def payloadKernel(df: DataFrame, out: StructType)(
      parse: Array[Byte] => Option[Seq[Any]]): DataFrame =
    mapBinaryPartitions(df.select(col("id"), col("payload")), out, rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val parsed =
          if (bytes == null) None
          else try parse(bytes)
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case Some(vals) => Row.fromSeq(r.get(0) +: (vals :+ true))
          case None =>
            Row.fromSeq(r.get(0) +: (Seq.fill(out.size - 2)(null) :+ false))
        }
      })

  /** ImageIO read WITHOUT the JRE's default disk cache: payloads are
    * already in-memory byte arrays — the default FileCacheImageInput
    * Stream would spool every payload through an executor temp file. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself on success;
    // close again only for the throw path, swallowing the double-close
    try Option(javax.imageio.ImageIO.read(iis))
    finally try iis.close() catch { case _: java.io.IOException => () }
  }

  /** REAL image decode through the [[mapBinaryPartitions]] seam — proof
    * the seam takes an actual codec, not only the deterministic stubs.
    * `javax.imageio` is pure JVM (the JRE registers PNG/BMP/GIF/JPEG
    * readers; no native libs), so this runs on any executor. Input: a
    * [[pack]]ed frame (`id`, `payload`, `meta`); output one row per
    * payload with the decoded `width`/`height`/`channels` and `ok=false`
    * + null dims for bytes no registered reader accepts. Narrow map, no
    * shuffle; only `id`+`payload` are read, so the scan prunes `meta`. */
  def decodeImages(df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("ok", BooleanType)))
    payloadKernel(df, out)(bytes => readImage(bytes).map(img =>
      Seq(img.getWidth, img.getHeight, img.getColorModel.getNumComponents)))
  }

  /** REAL image resize at the seam: ImageIO decode → `Graphics2D`
    * bilinear scale to fit `maxSide` (aspect preserved, never upscales)
    * → PNG re-encode. Pure JRE. Output per payload: the resized PNG
    * `payload` + `width`/`height`, original passthrough (already small
    * enough) included, `ok=false` + null payload for undecodable bytes.
    * This retires [[resizeStub]] for every JRE-decodable format; the
    * stub remains only as the deterministic twin for formats still
    * lacking a codec. */
  def resizeImages(df: DataFrame, maxSide: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("ok", BooleanType)))
    payloadKernel(df, out)(bytes => readImage(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val side = math.max(w, h)
      if (side <= maxSide) Seq(bytes, w, h) // never upscale
      else {
        // Long math: w * maxSide overflows Int for real JPEG strip sizes
        val nw = math.max(1L, w.toLong * maxSide / side).toInt
        val nh = math.max(1L, h.toLong * maxSide / side).toInt
        // keep alpha when the source has it — flattening onto an RGB
        // canvas would composite transparency to opaque black
        val imgType =
          if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
          else java.awt.image.BufferedImage.TYPE_INT_RGB
        val scaled = new java.awt.image.BufferedImage(nw, nh, imgType)
        val g = scaled.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        // in-memory image output stream (no executor temp-file spool)
        val buf = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
        try javax.imageio.ImageIO.write(scaled, "png", ios) finally ios.close()
        Seq(buf.toByteArray, nw, nh)
      }
    })
  }

  /** REAL image feature extraction at the seam (the non-stub half of
    * what [[extractFeaturesStub]] fakes): ImageIO decode → per-channel
    * means + mean luminance + a 16-bin luminance-histogram entropy —
    * the cheap real signals a training-data sweep filters on (blank /
    * low-contrast / over-dark detection). Pure JRE; `ok=false` for
    * undecodable payloads. */
  def extractImageFeatures(df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType), StructField("mean_luma", DoubleType),
      StructField("luma_entropy", DoubleType),
      StructField("ok", BooleanType)))
    payloadKernel(df, out)(bytes => readImage(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb, sl) = (0.0, 0.0, 0.0, 0.0)
      val hist = new Array[Long](16)
      // bulk row fetches: per-pixel getRGB pays a ColorModel conversion
      // and bounds check per call — an order of magnitude on megapixels
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val (cr, cg, cb) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          val luma = 0.299 * cr + 0.587 * cg + 0.114 * cb
          sr += cr; sg += cg; sb += cb; sl += luma
          hist((luma / 16).toInt.min(15)) += 1
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val entropy = hist.foldLeft(0.0) { (e, c) =>
        if (c == 0) e else { val p = c / n; e - p * math.log(p) / math.log(2) }
      }
      Seq(sr / n, sg / n, sb / n, sl / n, entropy)
    })
  }

  /** REAL audio feature extraction at the seam: decode the PCM body via
    * `javax.sound.sampled` (WAV/AIFF/AU) and compute RMS, peak, and
    * zero-crossing rate over the first `maxFrames` frames (bounded cost
    * per payload — a 10-hour clip costs the same as a 10-second one).
    * These are the silence / clipping / noise screens an audio pipeline
    * actually filters on. 16-bit and 8-bit PCM; `ok=false` otherwise. */
  def extractAudioFeatures(df: DataFrame, maxFrames: Int = 1 << 20): DataFrame = {
    import javax.sound.sampled.AudioFormat.Encoding
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("rms", DoubleType), StructField("peak", DoubleType),
      StructField("zero_cross_rate", DoubleType),
      StructField("n_frames_read", LongType),
      StructField("ok", BooleanType)))
    val cap = maxFrames
    payloadKernel(df, out) { bytes =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val frameSize = fmt.getFrameSize
        // interpret samples by their DECLARED encoding: 8-bit AIFF is
        // PCM_SIGNED, 8-bit WAV is PCM_UNSIGNED — assuming either way
        // misreads silence as full-scale; non-PCM (ULAW/ALAW) would
        // produce meaningless stats, so it degrades to ok=false
        val signed = fmt.getEncoding == Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding == Encoding.PCM_UNSIGNED
        if ((bits != 16 && bits != 8) || frameSize <= 0 || !(signed || unsigned)) None
        else {
          val buf = new Array[Byte](frameSize * 4096)
          var (sumSq, peak) = (0.0, 0.0)
          var (zc, frames) = (0L, 0L)
          var prevSign = 0
          var done = false
          while (!done && frames < cap) {
            val n = ais.read(buf)
            if (n <= 0) done = true
            else {
              var f = 0
              val nf = n / frameSize
              while (f < nf && frames < cap) {
                // first channel of the frame, normalized to [-1, 1]
                val off = f * frameSize
                val s =
                  if (bits == 16) {
                    val raw =
                      if (fmt.isBigEndian) (buf(off) << 8) | (buf(off + 1) & 0xff)
                      else (buf(off + 1) << 8) | (buf(off) & 0xff)
                    (if (signed) raw else (raw & 0xffff) - 32768).toDouble / 32768.0
                  } else {
                    (if (signed) buf(off).toInt
                     else (buf(off) & 0xff) - 128).toDouble / 128.0
                  }
                sumSq += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
                if (prevSign != 0 && sign != prevSign) zc += 1
                prevSign = sign
                frames += 1
                f += 1
              }
            }
          }
          if (frames == 0) None
          else Some(Seq[Any](math.sqrt(sumSq / frames), peak,
            zc.toDouble / frames, frames))
        }
      } finally ais.close()
    }
  }

  // ---- byte-level helpers for the container parsers below ----
  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def beU64(b: Array[Byte], off: Int): Long =
    (beU32(b, off) << 32) | beU32(b, off + 4)
  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def leU24(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL MP4/ISO-BMFF container parse (the video analogue of
    * [[decodeAudio]]'s header-only shape): walks the box tree per the
    * PUBLIC ISO 14496-12 layout — `ftyp` for the brand, `moov/mvhd` for
    * timescale+duration, `moov/trak/tkhd` for presentation width/height
    * (16.16 fixed point), counting tracks. Reads only box headers and two
    * fixed-size leaf boxes: cost is O(box count), never O(media bytes) —
    * the right shape for a 100 TB metadata sweep. BITSTREAM decode
    * (frames→pixels) still needs a native codec at this same seam; what
    * stays fake in this file is only that pixel tier. */
  private[graft] def parseMp4(b: Array[Byte]): Option[(String, Option[Double], Option[Long], Option[Long], Int)] = {
    if (b == null || b.length < 16) return None
    // (type, payloadFrom, payloadTo) for each well-formed box in
    // [from, to); a malformed size stops the walk cleanly (no partial box).
    // size==0 ("extends to end of file") is legal ONLY for the LAST
    // top-level box (ISO 14496-12 §4.2). We accept a top-level size-0 box
    // as extends-to-EOF and then TERMINATE the walk explicitly: the box is
    // thereby the last one by construction, so the spec condition holds for
    // everything we emit. For a malformed file with a non-last size-0 box
    // (e.g. a zero-size `free` before `moov`) this means later siblings are
    // deliberately not emitted — their bytes are inside the size-0 box's
    // payload per the file's own claim — and metadata degrades to None,
    // matching the malformed-input policy of the rest of this parser.
    // A NESTED size-0 box would silently swallow its following siblings
    // (mvhd/trak after it inside moov), so below top level it is treated
    // as malformed instead.
    def boxes(from: Int, to: Int, topLevel: Boolean): Seq[(String, Int, Int)] = {
      val acc = Seq.newBuilder[(String, Int, Int)]
      var off = from
      var live = true
      while (live && off + 8 <= to) {
        val size0 = beU32(b, off)
        val typ = fourcc(b, off + 4)
        val (hdr, size) =
          if (size0 == 1 && off + 16 <= to) (16L, beU64(b, off + 8))
          else if (size0 == 0 && topLevel) { live = false; (8L, (to - off).toLong) }
          else (8L, size0) // nested size-0 falls through: size < hdr stops
        if (size < hdr || off + size > to) { live = false }
        else { acc += ((typ, off + hdr.toInt, (off + size).toInt)); off += size.toInt }
      }
      acc.result()
    }
    val top = boxes(0, b.length, topLevel = true)
    val brand = top.collectFirst { case ("ftyp", f, t) if t - f >= 4 => fourcc(b, f) }
    if (brand.isEmpty) return None // not ISO-BMFF
    val moov = top.collectFirst { case ("moov", f, t) => (f, t) }
    val inMoov = moov.map { case (f, t) => boxes(f, t, topLevel = false) }.getOrElse(Nil)
    val durationMs = inMoov.collectFirst { case ("mvhd", f, t) => (f, t) }.flatMap {
      case (f, t) if t - f < 4 => None // empty/truncated box: no version byte
      case (f, t) =>
        val v = b(f) & 0xff
        if (v == 1 && t - f >= 32) {
          val scale = beU32(b, f + 20); val dur = beU64(b, f + 24)
          if (scale > 0) Some(dur * 1000.0 / scale) else None
        } else if (v == 0 && t - f >= 20) {
          val scale = beU32(b, f + 12); val dur = beU32(b, f + 16)
          if (scale > 0) Some(dur * 1000.0 / scale) else None
        } else None
    }
    val traks = inMoov.collect { case ("trak", f, t) => (f, t) }
    val dims = traks.iterator.flatMap { case (f, t) =>
      boxes(f, t, topLevel = false)
        .collectFirst { case ("tkhd", tf, tt) => (tf, tt) }.flatMap {
        case (tf, tt) if tt - tf < 4 => None // no version byte to read
        case (tf, tt) =>
          val v = b(tf) & 0xff
          val base = if (v == 1) 88 else 76 // 16.16 width/height at the box tail
          if (tt - tf >= base + 8) {
            val w = beU32(b, tf + base) >> 16; val h = beU32(b, tf + base + 4) >> 16
            if (w > 0 && h > 0) Some((w, h)) else None
          } else None
      }
    }.nextOption()
    Some((brand.get, durationMs, dims.map(_._1), dims.map(_._2), traks.size))
  }

  /** MP4 probe over packed payloads: one row per payload with the
    * container `brand`, `duration_ms`, first visual track's
    * `width`/`height`, `n_tracks`, and `ok=false` for bytes that are not
    * ISO-BMFF (corrupt payloads degrade, never kill the scan). */
  def probeVideo(df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("brand", StringType),
      StructField("duration_ms", DoubleType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_tracks", IntegerType),
      StructField("ok", BooleanType)))
    payloadKernel(df, out)(bytes => parseMp4(bytes).map {
      case (brand, dur, w, h, n) => Seq(brand, dur.orNull, w.orNull, h.orNull, n)
    })
  }

  /** REAL MPEG audio (MP3) frame-header parse per the PUBLIC MPEG-1/2
    * audio spec: skips an ID3v2 tag (synchsafe size), scans to the first
    * frame sync (11 set bits), decodes version/layer/bitrate/sample-rate/
    * channel-mode from the 4-byte header, and computes duration EXACTLY
    * from a Xing/Info header's frame count when the first frame carries
    * one (the VBR case — a byte-count estimate at the first frame's
    * bitrate would be wildly wrong there); otherwise estimates from the
    * audio byte count at the frame's bitrate (exact for CBR), excluding
    * a trailing ID3v1 tag from the byte count. Layer III only — that IS
    * mp3; Layer I/II sync patterns return None. */
  private[graft] def parseMp3(b: Array[Byte]): Option[(String, Int, Int, Int, Double)] = {
    if (b == null || b.length < 4) return None
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + sz
    }
    val audioStart = off
    // a 128-byte ID3v1 footer is metadata, not audio — exclude it from
    // the CBR byte-count estimate
    val audioEnd =
      if (b.length - audioStart >= 128 + 4 && b(b.length - 128) == 'T' &&
          b(b.length - 127) == 'A' && b(b.length - 126) == 'G') b.length - 128
      else b.length
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) == 0xff && (b(off + 1) & 0xe0) == 0xe0) {
        val verBits = (b(off + 1) >> 3) & 0x3 // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (b(off + 1) >> 1) & 0x3 // 1=Layer III
        val brIdx = (b(off + 2) >> 4) & 0xf
        val srIdx = (b(off + 2) >> 2) & 0x3
        val mode = (b(off + 3) >> 6) & 0x3 // 3=mono
        if (verBits != 1 && layerBits == 1 && brIdx >= 1 && brIdx <= 14 && srIdx != 3) {
          val v1 = verBits == 3
          val kbps = (if (v1) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
                      else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))(brIdx)
          val sr = (verBits match {
            case 3 => Array(44100, 48000, 32000)
            case 2 => Array(22050, 24000, 16000)
            case _ => Array(11025, 12000, 8000)
          })(srIdx)
          val version = verBits match {
            case 3 => "MPEG1"; case 2 => "MPEG2"; case _ => "MPEG2.5"
          }
          // Xing/Info header (LAME/Fraunhofer VBR tag, public format):
          // sits after the Layer III side info — MPEG1: 17 (mono) / 32
          // bytes, MPEG2/2.5: 9 / 17 — and carries a 32-bit flags word;
          // flags bit 0 = a 32-bit total FRAME count follows. frames ×
          // samples-per-frame (1152 MPEG1 LIII, 576 MPEG2/2.5) / rate is
          // the exact duration, independent of bitrate variation. A
          // CLEAR protection bit (header bit 0 == 0) means a 16-bit CRC
          // sits between the header and the side info — skip it or the
          // tag lookup lands 2 bytes short on CRC-protected frames.
          val sideInfo = (v1, mode == 3) match {
            case (true, true) => 17; case (true, false) => 32
            case (false, true) => 9; case (false, false) => 17
          }
          val crc = if ((b(off + 1) & 0x1) == 0) 2 else 0
          val xingOff = off + 4 + crc + sideInfo
          val xingDur =
            if (xingOff + 8 <= b.length &&
                (fourcc(b, xingOff) == "Xing" || fourcc(b, xingOff) == "Info") &&
                (beU32(b, xingOff + 4) & 1L) != 0 && xingOff + 12 <= b.length) {
              val frames = beU32(b, xingOff + 8)
              val spf = if (v1) 1152 else 576
              Some(frames * spf * 1000.0 / sr)
            } else None
          val durationMs = xingDur.getOrElse(
            (audioEnd - audioStart) * 8.0 / (kbps * 1000.0) * 1000.0)
          return Some((version, kbps, sr, if (mode == 3) 1 else 2, durationMs))
        }
        off += 1 // false sync (or non-Layer-III): keep scanning
      } else off += 1
    }
    None
  }

  /** MP3 probe over packed payloads: `version`, `bitrate_kbps`,
    * `sample_rate`, `channels`, CBR-estimated `duration_ms`, `ok`. */
  def probeMp3(df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("version", StringType),
      StructField("bitrate_kbps", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("duration_ms", DoubleType),
      StructField("ok", BooleanType)))
    payloadKernel(df, out)(bytes => parseMp3(bytes).map {
      case (ver, kbps, sr, ch, dur) => Seq(ver, kbps, sr, ch, dur)
    })
  }

  /** REAL WebP header parse per the PUBLIC RIFF/WebP container spec:
    * `VP8X` (extended: 24-bit canvas minus-one), `VP8L` (lossless: 14-bit
    * packed minus-one behind the 0x2F signature), `VP8 ` (lossy: 14-bit
    * dims behind the 9D 01 2A keyframe start code). Returns
    * (format, width, height). */
  private[graft] def parseWebp(b: Array[Byte]): Option[(String, Long, Long)] = {
    if (b == null || b.length < 20) return None
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WEBP") return None
    fourcc(b, 12) match {
      case "VP8X" if b.length >= 30 =>
        Some(("extended", leU24(b, 24) + 1, leU24(b, 27) + 1))
      case "VP8L" if b.length >= 25 && (b(20) & 0xff) == 0x2f =>
        val bits = (b(21) & 0xffL) | ((b(22) & 0xffL) << 8) |
          ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 24)
        Some(("lossless", (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1))
      case "VP8 " if b.length >= 30 &&
          (b(23) & 0xff) == 0x9d && (b(24) & 0xff) == 0x01 && (b(25) & 0xff) == 0x2a =>
        Some(("lossy", leU16(b, 26) & 0x3fff, leU16(b, 28) & 0x3fff))
      case _ => None
    }
  }

  /** WebP probe over packed payloads: `format` (lossy/lossless/extended),
    * `width`, `height`, `ok`. */
  def probeWebp(df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("id", df.schema("id").dataType),
      StructField("format", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("ok", BooleanType)))
    payloadKernel(df, out)(bytes => parseWebp(bytes).map {
      case (fmt, w, h) => Seq(fmt, w, h)
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
    payloadKernel(df, out) { bytes =>
      Option(javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))).map { aff =>
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        val known = frames >= 0 && fmt.getFrameRate > 0
        Seq(fmt.getSampleRate.toDouble, fmt.getChannels,
          fmt.getSampleSizeInBits,
          if (frames >= 0) frames else null,
          if (known) frames * 1000.0 / fmt.getFrameRate else null)
      }
    }
  }
}
