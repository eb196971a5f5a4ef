package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * as opaque `binary` columns with typed metadata, and batched
  * decode / feature-extract / resize / frame-sample operators over
  * `mapPartitions`.
  *
  * The decode step is REAL: payloads are valid grayscale PNGs (encoded
  * here via `java.util.zip.Deflater` + CRC32 — the JDK ships zlib) and
  * decoded through `javax.imageio.ImageIO`, the JDK's built-in PNG
  * codec. Video rows use the filmstrip convention (one PNG of height
  * frame_h x n_frames; frame f = scanline rows f*h .. (f+1)*h), so a
  * multi-frame payload still decodes through the same image codec.
  * The m10 driver query hash-checks the whole encode -> ImageIO ->
  * feature path against a DuckDB recompute over the raw pixel fixture.
  *
  * Scale notes: media payloads dominate row size — operators here never
  * shuffle the binary column (features are extracted map-side, then the
  * payload is dropped before any wide operation); partition sizing is
  * by row count (`maxRowsPerPartition`) because payload bytes, not row
  * counts, bound executor memory.
  */
object Multimodal extends Serializable {

  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      mean_intensity: Double, max_intensity: Int, histogram: Seq[Long])
  case class FrameSample(media_id: Long, frame_no: Int, mean_intensity: Double)

  /** The deterministic pixel generator (seeded by media_id) — the
    * INPUT definition both the synthetic corpus and the m10 oracle's
    * raw-pixel dump derive from, so the oracle never goes through the
    * codec under test. */
  def syntheticPixel(id: Long, i: Int): Int =
    (((id * 2654435761L + i * 40503L) >>> 16) & 0xff).toInt

  /** Deterministic synthetic corpus (seeded by media_id) — stands in
    * for a real binary source; payloads are REAL grayscale PNGs
    * (videos: filmstrip PNGs, one frame per h-row band). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      val frames = if (id % 4 == 0) 4 else 1 // every 4th row is a "video"
      val pixels = Array.tabulate(w * h * frames)(i => syntheticPixel(id, i).toByte)
      MediaRow(id, encodeGrayPng(w, h * frames, pixels), MediaMeta(
        if (frames > 1) "video" else "image", w, h, 0, frames * 40L))
    }
  }

  // ---- REAL binary-column operators (no codec required) -------------
  // Container-format metadata lives in the payload's LEADING bytes, so
  // format sniffing and dimension extraction are pure expressions over
  // substring(binary)+hex+conv — whole-stage codegen, no UDF, and at
  // 100 TB they run inside the scan stage; the payload never shuffles.

  private val PngSignature = "89504E470D0A1A0A"

  /** Magic-byte format sniff: png / jpeg / wav / unknown. */
  def sniffFormat(bin: Column): Column =
    when(upper(hex(substring(bin, 1, 8))) === PngSignature, "png")
      .when(upper(hex(substring(bin, 1, 3))) === "FFD8FF", "jpeg")
      .when(upper(hex(substring(bin, 1, 4))) === "52494646" && // "RIFF"
            upper(hex(substring(bin, 9, 4))) === "57415645", "wav") // "WAVE"
      .otherwise("unknown")

  /** PNG IHDR fields at fixed offsets (signature 1-8, chunk length
    * 9-12, "IHDR" 13-16, then big-endian width/height + depth/type).
    * Null-safe: short or non-PNG payloads yield nulls via the guard. */
  private def ihdrField(bin: Column, off: Int, len: Int): Column =
    when(upper(hex(substring(bin, 1, 8))) === PngSignature,
      conv(hex(substring(bin, off, len)), 16, 10).cast("int"))
  def pngWidth(bin: Column): Column = ihdrField(bin, 17, 4)
  def pngHeight(bin: Column): Column = ihdrField(bin, 21, 4)
  def pngBitDepth(bin: Column): Column = ihdrField(bin, 25, 1)
  def pngColorType(bin: Column): Column = ihdrField(bin, 26, 1)

  /** Header-only PNG fabricator for fixtures (signature + IHDR — enough
    * bytes for every metadata operator above, no pixel data). */
  def fakePng(width: Int, height: Int, bitDepth: Int = 8, colorType: Int = 0): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(26)
    bb.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13)
    bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(width)
    bb.putInt(height)
    bb.put(bitDepth.toByte)
    bb.put(colorType.toByte)
    bb.array()
  }

  /** Real grayscale-PNG encoder: signature + IHDR + one IDAT (filter-0
    * scanlines, zlib via `Deflater`) + IEND, CRC32 per chunk. PNG gray
    * 8-bit is lossless, so encode -> ImageIO decode is an exact pixel
    * round-trip — what lets m10 hash-match a raw-pixel oracle. */
  def encodeGrayPng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val raw = new Array[Byte]((width + 1) * height) // leading 0 = filter None
    var y = 0
    while (y < height) {
      System.arraycopy(pixels, y * width, raw, y * (width + 1) + 1, width)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte)                  // 8-bit, gray
      .put(0.toByte).put(0.toByte).put(0.toByte)    // deflate, adaptive, no interlace
      .array()
    Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Real grayscale-JPEG encoder through the JDK's built-in writer,
    * QUALITY-PINNED (MODE_EXPLICIT — the default would float with JDK
    * configuration): the fixture side of the m32 gate. JPEG is LOSSY,
    * so unlike [[encodeGrayPng]] the decode is NOT the input pixels —
    * any oracle must recompute from a dump of the DECODED payload,
    * never from the generator (Media.jpegPixelsExpected). Within one
    * JVM the encode is deterministic for fixed input+quality, which is
    * all the gate needs: the query side and the fixture dump encode
    * the same bytes and decode through the same codec, so a hash match
    * certifies the Spark-side plumbing (batching, frame slice, feature
    * arithmetic) end-to-end. */
  def encodeGrayJpeg(width: Int, height: Int, pixels: Array[Byte],
      quality: Float = 0.85f): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** JPEG twin of [[syntheticMedia]]: same generator pixels, same
    * dimensions, payloads encoded as grayscale JPEG (all single-frame —
    * the filmstrip trick needs losslessness to slice exactly; real
    * video is a container format, not a tall JPEG). Real image corpora
    * are overwhelmingly JPEG, so the decode path earns its own gate
    * (m32) instead of riding on PNG's. */
  def syntheticJpegMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      val pixels = Array.tabulate(w * h)(i => syntheticPixel(id, i).toByte)
      MediaRow(id, encodeGrayJpeg(w, h, pixels),
        MediaMeta("image", w, h, 0, 40L))
    }
  }

  /** Real image decode through the JDK's built-in codec
    * (`javax.imageio.ImageIO` — PNG/JPEG ship with every JDK): returns
    * (width, height, band-0 samples row-major). */
  def decodeImage(content: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, px)
  }

  /** One frame of a (possibly filmstrip) payload: decode via ImageIO,
    * slice the frame's h-row band. `decoded` lets per-partition callers
    * decode once and slice many frames. */
  private def grayFrame(decoded: (Int, Int, Array[Int]), w: Int, h: Int,
      frame: Int): Array[Int] = {
    val (dw, dh, px) = decoded
    require(dw == w && dh % h == 0 && (frame + 1) * h <= dh,
      s"decoded ${dw}x$dh incompatible with frame $frame of ${w}x$h")
    java.util.Arrays.copyOfRange(px, frame * w * h, (frame + 1) * w * h)
  }

  // ---- REAL audio path (JDK codec: javax.sound.sampled) -------------

  case class AudioFeatures(media_id: Long, sample_rate: Long,
      n_samples: Long, duration_ms: Long, max_amp: Long, min_amp: Long,
      sum_abs: Long, energy: Long)

  /** The deterministic sample generator (seeded by media_id) — the
    * INPUT definition shared by the synthetic audio corpus and the m11
    * oracle's raw-sample dump (range [-32768, 32767]). */
  def syntheticSample(id: Long, i: Int): Int =
    ((((id * 2654435761L + i * 104729L) >>> 15) & 0xffff) - 32768).toInt

  /** Real 16-bit mono PCM WAV encoder (RIFF + fmt + data, all
    * little-endian). PCM is uncompressed, so encode -> AudioSystem
    * decode is an exact sample round-trip. */
  def encodePcmWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  /** Real audio decode through the JDK's built-in WAV codec
    * (`javax.sound.sampled.AudioSystem`): returns (sampleRate, signed
    * 16-bit samples). The rate comes from the parsed fmt chunk, the
    * samples from the data chunk — both certified by m11's oracle. */
  def decodePcm(content: Array[Byte]): (Int, Array[Int]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"expected 16-bit mono LE PCM, got $fmt")
    val bytes = in.readAllBytes()
    in.close()
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
      i += 1
    }
    (fmt.getSampleRate.toInt, out)
  }

  /** Deterministic synthetic audio corpus: real PCM WAV payloads,
    * varying lengths, metadata consistent with the encoded bytes. */
  def syntheticAudio(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rate = 8000
      val nSamples = 400 + (id % 5).toInt * 100
      val samples = Array.tabulate(nSamples)(i => syntheticSample(id, i))
      MediaRow(id, encodePcmWav(rate, samples),
        MediaMeta("audio", 0, 0, rate, nSamples * 1000L / rate))
    }
  }

  /** Batched audio feature extraction — same shape as `imageFeatures`:
    * decode map-side, only integer features ever shuffle. Integer
    * features (sum |v|, sum v^2, extrema) keep the oracle comparison
    * exact — no float accumulation order to disagree on. */
  def audioFeatures(audio: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val (rate, xs) = decodePcm(r.content)
        var mx = Int.MinValue; var mn = Int.MaxValue
        var sumAbs = 0L; var energy = 0L
        xs.foreach { v =>
          if (v > mx) mx = v
          if (v < mn) mn = v
          sumAbs += math.abs(v)
          energy += v.toLong * v
        }
        AudioFeatures(r.media_id, rate, xs.length,
          xs.length * 1000L / rate, mx, mn, sumAbs, energy)
      }
    }
  }

  case class AudioFrame(media_id: Long, frame_no: Int, n_samples: Int,
      max_amp: Int, sum_abs: Long, energy: Long, zero_crossings: Int)

  /** Fixed-length audio FRAME windowing (the feature grid VAD /
    * speech-detection pipelines score): each clip splits into
    * `frameLen`-sample frames (tail ragged), one row per frame with
    * integer features — extrema, Σ|v|, Σv², and the ZERO-CROSSING
    * count (sign flips between consecutive samples within the frame),
    * the classic cheap periodicity signal clip-level m11 cannot see.
    * Decode + windowing are map-side per payload (flatMap, payload
    * never retained); integer features keep the oracle exact. */
  def audioFrames(audio: Dataset[MediaRow], frameLen: Int): Dataset[AudioFrame] = {
    import audio.sparkSession.implicits._
    audio.flatMap { r =>
      val (_, xs) = decodePcm(r.content)
      (0 until (xs.length + frameLen - 1) / frameLen).map { f =>
        val s0 = f * frameLen
        val e0 = math.min(s0 + frameLen, xs.length)
        var mx = Int.MinValue; var sumAbs = 0L; var energy = 0L; var zc = 0
        var i = s0
        while (i < e0) {
          val v = xs(i)
          if (v > mx) mx = v
          sumAbs += math.abs(v)
          energy += v.toLong * v
          if (i > s0 && ((v >= 0) != (xs(i - 1) >= 0))) zc += 1
          i += 1
        }
        AudioFrame(r.media_id, f, e0 - s0, mx, sumAbs, energy, zc)
      }
    }
  }

  /** Batched feature extraction: one pass per partition, decoder
    * "session" initialized once per partition (the expensive part for
    * real codecs), features only — the binary never leaves the map. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // ImageIO's plugin scan happens once per executor JVM; per-row
      // work is the pure decode
      rows.map { r =>
        val px = grayFrame(decodeImage(r.content), r.meta.width, r.meta.height, 0)
        val hist = Array.fill(4)(0L)
        var sum = 0L; var mx = 0
        px.foreach { v =>
          sum += v; if (v > mx) mx = v
          hist(v >> 6) += 1
        }
        ImageFeatures(r.media_id, r.meta.width, r.meta.height,
          sum.toDouble / px.length, mx, hist.toSeq)
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame decoded,
    * one output row per sampled frame (flatMap — no payload retained).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video").flatMap { r =>
      val nFrames = (r.meta.durationMs / 40L).toInt
      val decoded = decodeImage(r.content) // one codec pass per payload
      (0 until nFrames by stride).map { f =>
        val px = grayFrame(decoded, r.meta.width, r.meta.height, f)
        FrameSample(r.media_id, f, px.map(_.toLong).sum.toDouble / px.length)
      }
    }
  }

  case class ResizedBlock(media_id: Long, by: Int, bx: Int, n_px: Int,
      px_sum: Long, px_avg: Int)

  /** Image RESIZE by box averaging (the standard antialiased downsample
    * for thumbnailing / model-input normalization): each `factor`×
    * `factor` pixel block of frame 0 collapses to its rounded mean.
    * Edge blocks are ragged (dimensions need not divide by `factor`);
    * the mean is computed over the pixels a block actually covers, the
    * rounding is explicit half-up INTEGER arithmetic ((2·sum + n) div
    * 2n) so the resized raster is a pure function of the input pixels —
    * what lets m15 hash-match a DuckDB recompute from the raw pixel
    * fixture. Output is one row per OUTPUT pixel (sum and count ride
    * along so the oracle can verify the aggregation itself, not just
    * the rounded byte). Scale: decode + reduce are map-side per
    * payload; the payload never shuffles, and output size is input
    * pixels / factor² — resize is a data-REDUCING operator, so it
    * belongs before any wide stage in a media pipeline. */
  def resizeBox(media: Dataset[MediaRow], factor: Int): Dataset[ResizedBlock] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val w = r.meta.width; val h = r.meta.height
      val px = grayFrame(decodeImage(r.content), w, h, 0)
      val ow = (w + factor - 1) / factor
      val oh = (h + factor - 1) / factor
      for {
        by <- 0 until oh
        bx <- 0 until ow
      } yield {
        var sum = 0L; var n = 0
        var y = by * factor
        while (y < math.min((by + 1) * factor, h)) {
          var x = bx * factor
          while (x < math.min((bx + 1) * factor, w)) {
            sum += px(y * w + x); n += 1; x += 1
          }
          y += 1
        }
        ResizedBlock(r.media_id, by, bx, n, sum,
          ((2 * sum + n) / (2 * n)).toInt)
      }
    }
  }

  /** Size-aware repartition before a heavy decode: payload bytes bound
    * memory, so cap rows per partition explicitly rather than relying
    * on input-split sizing. `rowCount` comes from the caller (catalog
    * stats, an upstream count, or a known corpus size) — a library
    * operator must not fire an eager `count()` job of its own. */
  def partitionForDecode(media: Dataset[MediaRow], maxRowsPerPartition: Int,
      rowCount: Long): Dataset[MediaRow] = {
    val parts = math.max(1, math.ceil(rowCount.toDouble / maxRowsPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }
}
