package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * as opaque `binary` columns with typed metadata, and batched
  * decode / feature-extract / resize / frame-sample operators over
  * `mapPartitions`.
  *
  * The decode step itself is a STUB — this container ships no image or
  * audio codecs, so `decodeGray` deterministically fabricates a pixel
  * buffer from the bytes (clearly marked below). Everything around it
  * is the real engineering surface and is tested: the schema (binary
  * payload + metadata struct), doc-partition sizing, per-partition
  * batched iteration (decoder state amortized across a partition, the
  * mapInPandas batch shape in Scala form), and downstream columnar
  * feature output.
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

  /** Deterministic synthetic corpus (seeded by media_id) — stands in
    * for a real binary source; payload bytes are reproducible. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val w = 8 + (id % 5).toInt
      val h = 6 + (id % 3).toInt
      val frames = if (id % 4 == 0) 4 else 1 // every 4th row is a "video"
      val bytes = Array.tabulate(w * h * frames)(i =>
        (((id * 2654435761L + i * 40503L) >>> 16) & 0xff).toByte)
      MediaRow(id, bytes, MediaMeta(
        if (frames > 1) "video" else "image", w, h, 0, frames * 40L))
    }
  }

  // ---- REAL binary-column operators (no codec required) -------------
  // Container-format metadata lives in the payload's LEADING bytes, so
  // format sniffing and dimension extraction are pure expressions over
  // substring(binary)+hex+conv — whole-stage codegen, no UDF, and at
  // 100 TB they run inside the scan stage; the payload never shuffles.

  private val PngSignature = "89504E470D0A1A0A"

  /** Magic-byte format sniff: png / jpeg / unknown. */
  def sniffFormat(bin: Column): Column =
    when(upper(hex(substring(bin, 1, 8))) === PngSignature, "png")
      .when(upper(hex(substring(bin, 1, 3))) === "FFD8FF", "jpeg")
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

  /** ==== STUB ==== a real build links an image codec here; the fake
    * interprets the payload as row-major 8-bit gray pixels per `meta`.
    * Signature and batch usage are what a real decoder plugs into. */
  private def decodeGray(content: Array[Byte], w: Int, h: Int, frame: Int): Array[Int] = {
    val off = frame * w * h
    Array.tabulate(w * h)(i => content(off + i) & 0xff)
  }

  /** Batched feature extraction: one pass per partition, decoder
    * "session" initialized once per partition (the expensive part for
    * real codecs), features only — the binary never leaves the map. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (amortized)
      rows.map { r =>
        val px = decodeGray(r.content, r.meta.width, r.meta.height, 0)
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
      (0 until nFrames by stride).map { f =>
        val px = decodeGray(r.content, r.meta.width, r.meta.height, f)
        FrameSample(r.media_id, f, px.map(_.toLong).sum.toDouble / px.length)
      }
    }
  }

  /** Size-aware repartition before a heavy decode: payload bytes bound
    * memory, so cap rows per partition explicitly rather than relying
    * on input-split sizing. */
  def partitionForDecode(media: Dataset[MediaRow], maxRowsPerPartition: Int): Dataset[MediaRow] = {
    val n = media.count()
    val parts = math.max(1, math.ceil(n.toDouble / maxRowsPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }
}
