package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Driver-visible binary-column queries (north-star multimodal
  * extension, oracle-checked): container-format sniffing and PNG IHDR
  * metadata extraction over an opaque `binary` column. Both are pure
  * codegen expressions (substring+hex+conv — see ext/Multimodal), so at
  * 100 TB they run inside the scan stage and the payload never
  * shuffles; only the few extracted metadata bytes move.
  *
  * The driver test tables carry no binary column, so these run on a
  * deterministic inline fixture that graft.Verify also dumps to parquet
  * — the DuckDB oracles recompute the same sniff/extract from the same
  * bytes via hex-string arithmetic (hash-checked, not rows>0). The
  * pixel-decode operators stay spec-only (their decoder is an explicit
  * stub — no codecs in this container; MultimodalSpec covers them).
  */
object Media extends QueryModule {

  /** Deterministic mixed-format corpus: PNG headers with varying IHDR
    * fields, JPEG magic-byte payloads, and non-image junk. */
  def fixture(s: SparkSession): DataFrame = {
    import s.implicits._
    (0L until 12L).map { id =>
      val bytes: Array[Byte] = (id % 3) match {
        case 0 =>
          val v = (id / 3).toInt
          Multimodal.fakePng(16 + 7 * v, 9 + 5 * v,
            if (v % 2 == 0) 8 else 16, Seq(0, 2, 6)(v % 3))
        case 1 =>
          Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
            Array.tabulate(8)(i => ((id * 31 + i) & 0xff).toByte)
        case _ =>
          s"not-an-image-$id".getBytes("US-ASCII")
      }
      (id, bytes)
    }.toDF("media_id", "content")
  }

  /** m01 — magic-byte format sniff per payload. */
  private def m01(s: SparkSession, d: String): DataFrame =
    fixture(s)
      .select(col("media_id"),
        Multimodal.sniffFormat(col("content")).as("format"))
      .orderBy("media_id")

  /** m02 — PNG IHDR metadata (width/height/bit depth/color type at
    * fixed big-endian offsets); nulls for non-PNG payloads. */
  private def m02(s: SparkSession, d: String): DataFrame =
    fixture(s)
      .select(col("media_id"),
        Multimodal.pngWidth(col("content")).cast("long").as("width"),
        Multimodal.pngHeight(col("content")).cast("long").as("height"),
        Multimodal.pngBitDepth(col("content")).cast("long").as("bit_depth"),
        Multimodal.pngColorType(col("content")).cast("long").as("color_type"))
      .orderBy("media_id")

  val queries: Map[String, QueryFn] = Map(
    "m01_format_sniff" -> m01 _,
    "m02_png_metadata" -> m02 _,
  )

  // DuckDB reads the payload as BLOB; hex() gives the uppercase hex
  // string, so byte offset k maps to hex chars (k-1)*2+1 .. len*2.
  private val m01Sql =
    """SELECT media_id,
         CASE WHEN substr(hex(content), 1, 16) = '89504E470D0A1A0A' THEN 'png'
              WHEN substr(hex(content), 1, 6) = 'FFD8FF' THEN 'jpeg'
              ELSE 'unknown' END AS format
       FROM read_parquet('__FIXTURES__/media/*.parquet')
       ORDER BY media_id"""

  private val m02Sql =
    """SELECT media_id,
         CASE WHEN substr(hex(content), 1, 16) = '89504E470D0A1A0A'
              THEN ('0x' || substr(hex(content), 33, 8))::BIGINT END AS width,
         CASE WHEN substr(hex(content), 1, 16) = '89504E470D0A1A0A'
              THEN ('0x' || substr(hex(content), 41, 8))::BIGINT END AS height,
         CASE WHEN substr(hex(content), 1, 16) = '89504E470D0A1A0A'
              THEN ('0x' || substr(hex(content), 49, 2))::BIGINT END AS bit_depth,
         CASE WHEN substr(hex(content), 1, 16) = '89504E470D0A1A0A'
              THEN ('0x' || substr(hex(content), 51, 2))::BIGINT END AS color_type
       FROM read_parquet('__FIXTURES__/media/*.parquet')
       ORDER BY media_id"""

  val oracle: Map[String, String] = Map(
    "m01_format_sniff" -> m01Sql,
    "m02_png_metadata" -> m02Sql,
  )
}
