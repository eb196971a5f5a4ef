package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real binary PDF page-text source — the reference reads filings with
  * fitz: per-page `get_text()` plus keyword page search
  * (mainTesting.py:217-254, 273-285). This is an actual binary reader
  * for the file shapes real filings use, JDK-only:
  *
  *   - object location via the CLASSIC xref table, an XREF STREAM
  *     (PDF 1.5+), or the HYBRID form (classic trailer + /XRefStm,
  *     Acrobat's 1.5-compatibility shape), following `/Prev` chains,
  *     with PNG predictors (the near-universal `/DecodeParms
  *     /Predictor 12` encoding of xref streams) and OBJECT STREAMS
  *     (`/ObjStm`, type-2 entries) — a file whose dictionaries are
  *     themselves compressed reads fine;
  *   - a legacy fallback scan for files with no xref at all;
  *   - nested page trees (`/Pages` under `/Pages`), `/Contents` given
  *     as a single stream or an ARRAY of streams;
  *   - a real content-stream tokenizer: literal strings with all spec
  *     escapes (octal included), HEX strings, kerned `TJ` arrays,
  *     `Tj`/`'`/`"` show ops, `Td`/`TD`/`T*`/`Tm` positioning, inline
  *     dicts and `BI..EI` inline images skipped safely;
  *   - indirect `/Length` values resolved through the xref.
  *
  *   - font `/ToUnicode` CMap decoding (PDF 32000-1 §9.10.3): `Tf`
  *     tracks the active font, page `/Resources` (inherited through
  *     the page tree, §7.7.3.4) resolve font objects, and show-string
  *     bytes of a font carrying a CMap decode through its codespace/
  *     bfchar/bfrange tables — the shape every subsetted CID font in a
  *     real filing uses. Fonts without a CMap read as Latin-1, correct
  *     for unencoded Type1/WinAnsi text.
  *
  * Out of scope, stated: glyph decoding via font /Encoding differences
  * tables WITHOUT a /ToUnicode (no reliable text recovery exists for
  * those), and layout reconstruction beyond the text-matrix origin.
  *
  * Kerning-to-space rule, fixed and documented: inside a `TJ` array an
  * adjustment ≤ −180 thousandths of an em reads as a word break
  * (extractors conventionally threshold near half an em; the exact
  * constant only needs to be deterministic and matched by the fixture
  * encoder). Corrupt input fails LOUDLY with the object/offset in the
  * message — a quarantine pattern (m14) belongs upstream of the
  * parser, not silently inside it.
  *
  * Spark integration mirrors sources/Xlsx: binaryFile scan → per-file
  * executor-side parse via flatMap; the payload never shuffles, only
  * (file, page, line_no, text) rows move. A filing corpus at 100 TB
  * parallelizes per file inside the scan stage.
  */
object Pdf {

  case class Line(file: String, page: Long, line_no: Long, text: String)

  /** Read every *.pdf under `dir` into per-line rows. */
  def read(spark: SparkSession, dir: String): Dataset[Line] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.pdf")
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parsePdf(bytes).map { case (pg, ln, text) => Line(name, pg, ln, text) }
      }
  }

  /** Reference page-keyword search (`mainTesting.py:217-254`): pages
    * whose text contains the keyword, case-insensitively — first hit
    * per file in (file, page) order. */
  def searchPages(spark: SparkSession, dir: String, keyword: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hits = read(spark, dir)
      .filter(lower($"text").contains(keyword.toLowerCase))
      .groupBy($"file", $"page")
      .agg(count(lit(1)).as("n_hits"))
    hits.withColumn("rk", row_number().over(
        Window.partitionBy($"file").orderBy($"page")))
      .filter($"rk" === 1).drop("rk")
      .orderBy($"file")
  }

  case class PosLine(file: String, page: Long, line_no: Long,
      x: Double, y: Double, text: String)

  /** Read every *.pdf under `dir` into POSITIONED rows: each shown
    * string with the text-line origin (x, y) in page coordinates at
    * the moment of its show op. */
  def readPositioned(spark: SparkSession, dir: String): Dataset[PosLine] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.pdf")
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parsePdfPositioned(bytes).map { case (pg, ln, x, y, text) =>
          PosLine(name, pg, ln, x, y, text)
        }
      }
  }

  /** Table-region scan — the engine-native form of the reference's
    * tabula fixed-area read (`read_pdf(area=..)`, test_uploadPDF.py:
    * 31-34): crop to the rectangle [x0,x1]x[y0,y1], then rebuild the
    * grid — rows are distinct y values top-down (dense_rank, PDF y
    * grows upward), columns are left-to-right within a row. All window
    * work is partitioned per (file, page): at corpus scale every page
    * reconstructs independently inside its scan task's shuffle group —
    * no global ordering anywhere. */
  def tableRegion(spark: SparkSession, dir: String,
      x0: Double, y0: Double, x1: Double, y1: Double): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rowW = Window.partitionBy($"file", $"page").orderBy($"y".desc)
    val colW = Window.partitionBy($"file", $"page", $"y").orderBy($"x")
    readPositioned(spark, dir)
      .filter($"x".between(x0, x1) && $"y".between(y0, y1))
      .withColumn("row_idx", dense_rank().over(rowW).cast("long"))
      .withColumn("col_idx", row_number().over(colW).cast("long"))
      .select($"file", $"page", $"row_idx", $"col_idx",
        $"x".cast("long").as("x"), $"y".cast("long").as("y"),
        $"text".as("value"))
      .orderBy($"file", $"page", $"row_idx", $"col_idx")
  }

  // ---- parser (executor-side, JDK-only) -----------------------------

  /** Kern threshold (thousandths of an em): a TJ adjustment at or
    * below −KernSpace reads as a word break. */
  private[graft] val KernSpace = 180.0

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"corrupt PDF: $msg")

  /** One resolved indirect object: its dictionary/body text plus the
    * raw (still possibly compressed) stream payload when present. */
  private[graft] final case class PObj(body: String, stream: Option[Array[Byte]])

  /** All reachable objects of the document, resolved through the xref
    * (classic table or xref stream, /Prev chains, /ObjStm members) —
    * or, for a pre-xref/hand-built file with no `startxref`, a legacy
    * whole-file scan. */
  private[graft] final class Doc(bytes: Array[Byte]) {
    val raw = new String(bytes, ISO_8859_1) // byte-preserving view
    if (!raw.startsWith("%PDF-")) fail("missing %PDF- header")

    /** objnum → xref entry. type 1: (1, byteOffset, gen).
      * type 2: (2, objStmNum, indexInStream). First definition along
      * the /Prev chain wins (newest first). */
    private val entries = scala.collection.mutable.Map[Int, (Int, Long, Long)]()
    /** /Root ref from the newest trailer that names one. */
    var rootRef: Option[Int] = None
    private val cache = scala.collection.mutable.Map[Int, Option[PObj]]()
    private var legacy: Map[Int, PObj] = Map.empty

    locally {
      val sx = raw.lastIndexOf("startxref")
      if (sx < 0) legacy = legacyScan()
      else {
        val off = "\\d+".r.findFirstIn(raw.substring(sx)).map(_.toLong)
          .getOrElse(fail("startxref with no offset"))
        var next: Option[Long] = Some(off)
        var hops = 0
        while (next.isDefined) {
          hops += 1
          if (hops > 64) fail("xref /Prev chain longer than 64 sections")
          next = readXrefSection(next.get)
        }
      }
    }

    /** Parse one xref section at `off`; returns its /Prev offset. */
    private def readXrefSection(off: Long): Option[Long] = {
      if (off < 0 || off >= raw.length) fail(s"xref offset $off out of range")
      val at = raw.substring(off.toInt)
      if (at.startsWith("xref")) {
        // classic table: subsections of `start count` then 20-byte rows
        var p = 4
        def skipWs(): Unit = while (p < at.length && at.charAt(p).isWhitespace) p += 1
        def readInt(): Long = {
          skipWs(); val s = p
          while (p < at.length && at.charAt(p).isDigit) p += 1
          if (s == p) fail(s"malformed classic xref at $off")
          at.substring(s, p).toLong
        }
        skipWs()
        while (p < at.length && at.charAt(p).isDigit) {
          val start = readInt(); val n = readInt(); skipWs()
          (0L until n).foreach { i =>
            val row = at.substring(p, p + 18)
            p += 20 // rows are exactly 20 bytes incl. the 2-byte EOL
            val num = (start + i).toInt
            if (row.charAt(17) == 'n' && !entries.contains(num))
              entries(num) = (1, row.substring(0, 10).toLong,
                row.substring(11, 16).toLong)
          }
          skipWs()
        }
        val trailer = at.indexOf("trailer")
        if (trailer < 0) fail(s"classic xref at $off has no trailer")
        val tdict = at.substring(trailer)
        if (rootRef.isEmpty) rootRef = ref(tdict, "/Root")
        val tdictHead = tdict.take(tdict.indexOf(">>") + 2 max 0)
        // HYBRID reference file (PDF 32000-1 §7.5.8.4): the trailer's
        // /XRefStm points at an xref STREAM carrying the entries this
        // classic table lists as free (Acrobat's 1.5-compatibility
        // form — the compressed objects are invisible to pre-1.5
        // readers). Read it as its own section; the revision chain
        // still continues through THIS trailer's /Prev.
        "/XRefStm\\s+(\\d+)".r.findFirstMatchIn(tdictHead)
          .foreach(m => readXrefSection(m.group(1).toLong))
        "/Prev\\s+(\\d+)".r.findFirstMatchIn(tdictHead).map(_.group(1).toLong)
      } else {
        // xref STREAM: `N G obj << /Type /XRef ... >> stream`
        val (body, data) = objAtOffset(off)
        if (!body.contains("/XRef")) fail(s"object at $off is not an xref stream")
        val w = "/W\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(body)
          .map(_.group(1).trim.split("\\s+").toSeq.map(_.toInt))
          .getOrElse(fail(s"xref stream at $off lacks /W"))
        if (w.size != 3) fail(s"xref stream /W must have 3 fields, got $w")
        val size = "/Size\\s+(\\d+)".r.findFirstMatchIn(body)
          .map(_.group(1).toInt).getOrElse(fail("xref stream lacks /Size"))
        val index = "/Index\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(body)
          .map(_.group(1).trim.split("\\s+").toSeq.map(_.toInt))
          .getOrElse(Seq(0, size))
        val payload = decodeStream(body,
          data.getOrElse(fail(s"xref stream at $off has no payload")))
        val rowLen = w.sum
        if (rowLen == 0 || payload.length % rowLen != 0)
          fail(s"xref stream at $off: ${payload.length} bytes not a multiple of row width $rowLen")
        def field(row: Int, f: Int): Long = {
          var o = row * rowLen + w.take(f).sum
          var v = 0L
          (0 until w(f)).foreach { _ => v = (v << 8) | (payload(o) & 0xffL); o += 1 }
          v
        }
        var row = 0
        index.grouped(2).foreach { case Seq(start, n) =>
          (0 until n).foreach { i =>
            val num = start + i
            val t = if (w(0) == 0) 1L else field(row, 0)
            val f2 = field(row, 1); val f3 = field(row, 2)
            row += 1
            if (t != 0 && !entries.contains(num))
              entries(num) = (t.toInt, f2, f3)
          }
          case _ => fail("odd /Index")
        }
        if (rootRef.isEmpty) rootRef = ref(body, "/Root")
        "/Prev\\s+(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toLong)
      }
    }

    /** Parse `N G obj ...` at a byte offset: (body-before-stream,
      * stream payload if any). The stream is sliced by /Length
      * (indirect /Length resolved through the xref); a /Length past
      * EOF is a truncated file and fails loudly. */
    private def objAtOffset(off: Long): (String, Option[Array[Byte]]) = {
      val m = "^\\s*(\\d+)\\s+(\\d+)\\s+obj".r
        .findFirstMatchIn(raw.substring(off.toInt))
        .getOrElse(fail(s"no object header at offset $off"))
      val bodyStart = off.toInt + m.end
      sliceBody(bodyStart)
    }

    private def sliceBody(bodyStart: Int): (String, Option[Array[Byte]]) = {
      val endobj = raw.indexOf("endobj", bodyStart)
      val streamKw = raw.indexOf("stream", bodyStart)
      if (streamKw >= 0 && (endobj < 0 || streamKw < endobj)) {
        val body = raw.substring(bodyStart, streamKw)
        var ds = streamKw + "stream".length
        if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
        if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
        val len = lengthOf(body).getOrElse {
          // no direct/resolvable /Length: scan to the endstream keyword
          // (compressed payloads rarely contain it; stated best-effort)
          val es = raw.indexOf("endstream", ds)
          if (es < 0) fail(s"stream at $ds has neither /Length nor endstream")
          es - ds
        }
        if (ds + len > raw.length)
          fail(s"stream at $ds declares /Length $len past end of file (truncated?)")
        (body, Some(raw.substring(ds, ds + len).getBytes(ISO_8859_1)))
      } else if (endobj >= 0) {
        (raw.substring(bodyStart, endobj), None)
      } else fail(s"object at $bodyStart has no endobj (truncated?)")
    }

    private def lengthOf(body: String): Option[Int] =
      "/Length\\s+(\\d+)(\\s+\\d+\\s+R)?".r.findFirstMatchIn(body).flatMap { m =>
        if (m.group(2) == null) Some(m.group(1).toInt)
        else obj(m.group(1).toInt).map(_.body.trim.toInt) // indirect
      }

    /** Members of object stream `num`: header pairs then bodies. */
    private def objStmMembers(num: Int): Map[Long, String] = {
      val o = obj(num).getOrElse(fail(s"object stream $num missing"))
      if (!o.body.contains("/ObjStm")) fail(s"object $num is not /ObjStm")
      val n = "/N\\s+(\\d+)".r.findFirstMatchIn(o.body)
        .map(_.group(1).toInt).getOrElse(fail(s"/ObjStm $num lacks /N"))
      val first = "/First\\s+(\\d+)".r.findFirstMatchIn(o.body)
        .map(_.group(1).toInt).getOrElse(fail(s"/ObjStm $num lacks /First"))
      val payload = new String(decodeStream(o.body,
        o.stream.getOrElse(fail(s"/ObjStm $num has no payload"))), ISO_8859_1)
      val header = payload.take(first).trim.split("\\s+").map(_.toLong)
      if (header.length < 2 * n) fail(s"/ObjStm $num header too short")
      (0 until n).map { i =>
        val objNum = header(2 * i); val rel = header(2 * i + 1).toInt
        val end = if (i + 1 < n) first + header(2 * i + 3).toInt else payload.length
        objNum -> payload.substring(first + rel, end)
      }.toMap
    }

    private val objStmCache = scala.collection.mutable.Map[Int, Map[Long, String]]()

    /** Resolve object `num` (memoized). None for free/absent. */
    def obj(num: Int): Option[PObj] = cache.getOrElseUpdate(num, {
      if (legacy.nonEmpty) legacy.get(num)
      else entries.get(num).flatMap {
        case (1, off, _) =>
          val (b, s) = objAtOffset(off); Some(PObj(b, s))
        case (2, stm, _) =>
          objStmCache.getOrElseUpdate(stm.toInt, objStmMembers(stm.toInt))
            .get(num.toLong).map(PObj(_, None))
        case _ => None
      }
    })

    /** Decoded stream payload of object `num` (inflated if Flate). */
    def streamOf(num: Int): Array[Byte] = {
      val o = obj(num).getOrElse(fail(s"referenced object $num is missing"))
      decodeStream(o.body,
        o.stream.getOrElse(fail(s"object $num has no stream payload")))
    }

    /** The document catalog: trailer /Root when the xref gave one,
      * otherwise the first object that looks like a catalog. */
    def catalog: PObj =
      rootRef.flatMap(obj).orElse {
        val all = if (legacy.nonEmpty) legacy
          else entries.keys.flatMap(k => obj(k).map(k -> _)).toMap
        all.values.find(_.body.contains("/Catalog"))
      }.getOrElse(fail("no document catalog (missing or broken /Root)"))

    /** Legacy path for files with no startxref: every `N 0 obj` found
      * by scanning. Streams are sliced per object at their own match
      * position (the old reader's behavior, kept as the repair path). */
    private def legacyScan(): Map[Int, PObj] =
      "(?s)(?<!\\d)(\\d+)\\s+0\\s+obj".r.findAllMatchIn(raw).map { m =>
        m.group(1).toInt -> { val (b, s) = sliceBody(m.end); PObj(b, s) }
      }.toMap
  }

  private def ref(dict: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + "\\s+(\\d+)\\s+\\d+\\s+R").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** The stream's filter pipeline: `/Filter` as one name or an ARRAY
    * of names applied in order (PDF 32000-1 §7.4 — `[/ASCII85Decode
    * /FlateDecode]` is the classic mail-safe wrapping). */
  private[graft] def filtersOf(dict: String): Seq[String] =
    "/Filter\\s*(\\[[^\\]]*\\]|/[A-Za-z0-9]+)".r.findFirstMatchIn(dict)
      .map(m => "/([A-Za-z0-9]+)".r.findAllMatchIn(m.group(1))
        .map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)

  /** Decode a stream through its filter chain — Flate (optionally with
    * a PNG `/Predictor`), ASCIIHex, ASCII85, or none; anything else
    * (LZW, DCT, …) fails loudly with the filter name. */
  private def decodeStream(dict: String, data: Array[Byte]): Array[Byte] = {
    val decoded = filtersOf(dict).foldLeft(data) { (d, f) =>
      f match {
        case "FlateDecode" => inflate(d)
        case "ASCIIHexDecode" => asciiHexDecode(d)
        case "ASCII85Decode" => ascii85Decode(d)
        case other => fail(s"unsupported stream filter /$other")
      }
    }
    val pred = "/Predictor\\s+(\\d+)".r.findFirstMatchIn(dict)
      .map(_.group(1).toInt).getOrElse(1)
    if (pred < 2) decoded
    else {
      val cols = "/Columns\\s+(\\d+)".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(1)
      unpredictPng(decoded, cols)
    }
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` ends
    * the data, an odd trailing digit reads as if followed by 0. */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        if (v < 0) fail(s"ASCIIHexDecode: invalid character '$c'")
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): 5 chars `!`..`u` → 4 bytes base-85;
    * `z` = four zero bytes between groups; whitespace ignored; `~>`
    * ends the data; a partial final group of n chars pads with `u`
    * and emits n−1 bytes. */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(count: Int): Unit = { // count = chars in the group
      var v = 0L
      (0 until 5).foreach(k => v = v * 85 + (if (k < count) grp(k) else 84))
      val emit = count - 1
      (0 until emit).foreach(k => out.write(((v >> (8 * (3 - k))) & 0xff).toInt))
    }
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z') {
        if (n != 0) fail("ASCII85Decode: 'z' inside a group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!c.isWhitespace) {
        if (c < '!' || c > 'u') fail(s"ASCII85Decode: invalid character '$c'")
        grp(n) = c - '!'; n += 1
        if (n == 5) { flush(5); n = 0 }
      }
      i += 1
    }
    if (n == 1) fail("ASCII85Decode: lone trailing character")
    if (n > 1) flush(n)
    out.toByteArray
  }

  /** Reverse PNG row filters (predictors 10-15: each row = filter tag
    * byte + `cols` bytes). Colors/bpc are 1 for xref streams. */
  private[graft] def unpredictPng(data: Array[Byte], cols: Int): Array[Byte] = {
    val rowLen = cols + 1
    if (data.length % rowLen != 0)
      fail(s"predictor data ${data.length} bytes not a multiple of row ${rowLen}")
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * cols)
    val prev = new Array[Byte](cols)
    (0 until rows).foreach { r =>
      val tag = data(r * rowLen) & 0xff
      val row = new Array[Byte](cols)
      (0 until cols).foreach { i =>
        val x = data(r * rowLen + 1 + i) & 0xff
        val a = if (i > 0) row(i - 1) & 0xff else 0 // left (bpp=1)
        val b = prev(i) & 0xff                       // up
        val c = if (i > 0) prev(i - 1) & 0xff else 0 // up-left
        val v = tag match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case t => fail(s"unsupported PNG filter tag $t")
        }
        row(i) = (v & 0xff).toByte
      }
      System.arraycopy(row, 0, out, r * cols, cols)
      System.arraycopy(row, 0, prev, 0, cols)
    }
    out
  }

  /** Page object numbers in tree order (nested /Pages recursed), each
    * with the nearest /Resources spec — pages inherit /Resources from
    * ancestor /Pages nodes (PDF 32000-1 §7.7.3.4 inheritable
    * attributes), which is how real generators attach shared fonts. */
  private def pageObjs(doc: Doc): Seq[(Int, Option[String])] = {
    val pagesRef = ref(doc.catalog.body, "/Pages")
      .getOrElse(fail("catalog has no /Pages"))
    def walk(num: Int, depth: Int, inherited: Option[String]): Seq[(Int, Option[String])] = {
      if (depth > 64) fail("page tree deeper than 64 levels (cycle?)")
      val body = doc.obj(num).getOrElse(fail(s"page-tree object $num missing")).body
      val res = rawValue(body, "/Resources").orElse(inherited)
      if (body.contains("/Kids")) {
        val kids = "(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(
          "/Kids\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse("")
        ).map(_.group(1).toInt).toSeq
        kids.flatMap(walk(_, depth + 1, res))
      } else Seq((num, res))
    }
    walk(pagesRef, 0, None)
  }

  /** A page's full content: /Contents as one ref or an array of refs,
    * streams decoded and concatenated in order. */
  private def pageContent(doc: Doc, pageObj: Int): String = {
    val body = doc.obj(pageObj).getOrElse(fail(s"page object $pageObj missing")).body
    val arr = "/Contents\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(body)
    val refs = arr match {
      case Some(m) =>
        "(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
      case None => ref(body, "/Contents").toSeq
    }
    refs.map(n => new String(doc.streamOf(n), ISO_8859_1)).mkString("\n")
  }

  // ---- /ToUnicode CMaps (subsetted/CID font text) ---------------------

  /** A parsed /ToUnicode CMap: codespace ranges (byte-width, lo, hi)
    * plus the code → Unicode map (PDF 32000-1 §9.10.3). `decode` walks
    * a show-string's raw bytes, consuming the shortest codespace width
    * that matches at each position; a code inside the codespace with
    * no bf mapping renders U+FFFD (the conventional extractor choice);
    * bytes outside every codespace pass through as Latin-1 — which
    * also makes the no-CMap simple-font path exact. */
  private[graft] final case class CMap(
      ranges: Seq[(Int, Long, Long)], map: Map[Long, String]) {
    private val widths = ranges.map(_._1).distinct.sorted
    def decode(raw: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < raw.length) {
        var w = 0
        var code = 0L
        var hit = false
        val it = widths.iterator
        while (!hit && it.hasNext) {
          w = it.next()
          if (i + w <= raw.length) {
            code = 0L
            var k = 0
            while (k < w) { code = (code << 8) | (raw.charAt(i + k) & 0xff); k += 1 }
            hit = ranges.exists { case (rw, lo, hi) => rw == w && code >= lo && code <= hi }
          }
        }
        if (hit) { sb.append(map.getOrElse(code, "�")); i += w }
        else { sb.append(raw.charAt(i)); i += 1 }
      }
      sb.toString
    }
  }

  /** Parse a /ToUnicode CMap stream: codespacerange sections, bfchar
    * pairs, bfrange in both spec forms (incremented hex dst, explicit
    * dst array). Unknown operators (usecmap, cidrange, …) are ignored;
    * a bfrange wider than 64k codes fails loudly (bomb guard). When no
    * codespacerange is present, one full-width range is synthesized
    * per observed src width so decode still frames codes correctly. */
  private[graft] def parseCMap(text: String): CMap = {
    val tok = "<([0-9A-Fa-f]*)>|\\[|\\]|[A-Za-z]+".r
      .findAllMatchIn(text).toVector
    def hexOf(m: scala.util.matching.Regex.Match): Option[String] =
      Option(m.group(1))
    def codeOf(h: String): Long = java.lang.Long.parseLong(h, 16)
    // dst hex = UTF-16BE units (4 hex digits each); a lone byte pair
    // (2 digits) decodes as one char — seen in sloppy generators
    def utf16(h: String): String =
      if (h.isEmpty) ""
      else if (h.length % 4 == 0)
        h.grouped(4).map(u => Integer.parseInt(u, 16).toChar).mkString
      else h.grouped(2).map(u => Integer.parseInt(u, 16).toChar).mkString
    val ranges = Seq.newBuilder[(Int, Long, Long)]
    val map = Map.newBuilder[Long, String]
    val srcWidths = scala.collection.mutable.SortedSet[Int]()
    var mode = ""
    var i = 0
    while (i < tok.length) {
      val m = tok(i)
      m.matched match {
        case "begincodespacerange" => mode = "cs"; i += 1
        case "beginbfchar" => mode = "bc"; i += 1
        case "beginbfrange" => mode = "br"; i += 1
        case s if s.startsWith("end") => mode = ""; i += 1
        case _ if mode == "cs" =>
          (hexOf(m), tok.lift(i + 1).flatMap(hexOf)) match {
            case (Some(lo), Some(hi)) if lo.nonEmpty =>
              ranges += ((lo.length / 2, codeOf(lo), codeOf(hi)))
              i += 2
            case _ => i += 1
          }
        case _ if mode == "bc" =>
          (hexOf(m), tok.lift(i + 1).flatMap(hexOf)) match {
            case (Some(src), Some(dst)) if src.nonEmpty =>
              srcWidths += src.length / 2
              map += codeOf(src) -> utf16(dst)
              i += 2
            case _ => i += 1
          }
        case _ if mode == "br" =>
          (hexOf(m), tok.lift(i + 1).flatMap(hexOf)) match {
            case (Some(lo), Some(hi)) if lo.nonEmpty =>
              val (cLo, cHi) = (codeOf(lo), codeOf(hi))
              if (cHi - cLo > 65535) fail(s"bfrange spans ${cHi - cLo + 1} codes")
              srcWidths += lo.length / 2
              tok.lift(i + 2) match {
                case Some(d) if d.matched == "[" => // explicit dst array
                  var j = i + 3
                  var k = cLo
                  while (j < tok.length && tok(j).matched != "]") {
                    hexOf(tok(j)).foreach { h =>
                      if (k <= cHi) map += k -> utf16(h)
                      k += 1
                    }
                    j += 1
                  }
                  i = j + 1
                case Some(d) if hexOf(d).isDefined => // incremented dst
                  val base = utf16(hexOf(d).get)
                  var k = cLo
                  while (k <= cHi) {
                    val inc = (k - cLo).toInt
                    val s =
                      if (base.isEmpty) ""
                      else base.dropRight(1) + (base.last + inc).toChar
                    map += k -> s
                    k += 1
                  }
                  i += 3
                case _ => i += 2
              }
            case _ => i += 1
          }
        case _ => i += 1
      }
    }
    val rs = ranges.result()
    val effective =
      if (rs.nonEmpty) rs
      else srcWidths.toSeq.map(w => (w, 0L, (1L << (8 * w)) - 1))
    CMap(effective, map.result())
  }

  /** The raw value text that follows `key` in a dictionary body:
    * a balanced inline `<< … >>`, an `N g R` indirect reference, or a
    * bare token — whatever is there, uninterpreted. */
  private[graft] def rawValue(body: String, key: String): Option[String] = {
    val m = (java.util.regex.Pattern.quote(key) + "(?![A-Za-z0-9])").r
      .findFirstMatchIn(body).getOrElse(return None)
    var i = m.end
    while (i < body.length && body.charAt(i).isWhitespace) i += 1
    if (i >= body.length) None
    else if (body.startsWith("<<", i)) { // balanced inline dict
      var depth = 0
      val st = i
      while (i < body.length) {
        if (body.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (body.startsWith(">>", i)) {
          depth -= 1; i += 2
          if (depth == 0) return Some(body.substring(st, i))
        } else i += 1
      }
      None
    } else
      "^(\\d+)\\s+(\\d+)\\s+R".r.findFirstIn(body.substring(i))
        .orElse("^\\S+".r.findFirstIn(body.substring(i)))
  }

  /** Resolve a raw dict value to dictionary text: inline dicts are
    * already text; indirect refs load the object body. */
  private def resolveDict(doc: Doc, spec: String): Option[String] = {
    val t = spec.trim
    if (t.startsWith("<<")) Some(t)
    else "^(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(t)
      .flatMap(m => doc.obj(m.group(1).toInt).map(_.body))
  }

  /** Font-resource name → /ToUnicode CMap for one page. Fonts without
    * a /ToUnicode (unencoded Type1/WinAnsi text) get no entry and
    * their strings pass through as Latin-1, the pre-CMap behavior.
    * CMaps are memoized per document — subsetted fonts are shared
    * across pages. */
  private def fontsOf(doc: Doc, resSpec: Option[String],
      cache: scala.collection.mutable.Map[Int, Option[CMap]]): Map[String, CMap] =
    (for {
      spec <- resSpec.toSeq
      res <- resolveDict(doc, spec).toSeq
      fontSpec <- rawValue(res, "/Font").toSeq
      fonts <- resolveDict(doc, fontSpec).toSeq
      m <- "/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(fonts)
      cm <- cache.getOrElseUpdate(m.group(2).toInt,
        doc.obj(m.group(2).toInt).map(_.body)
          .flatMap(b => ref(b, "/ToUnicode"))
          .map(tn => parseCMap(new String(doc.streamOf(tn), ISO_8859_1))))
    } yield m.group(1) -> cm).toMap

  // ---- content-stream tokenizer --------------------------------------

  private[graft] sealed trait Tok
  private[graft] final case class TStr(s: String) extends Tok
  private[graft] final case class TNum(v: Double) extends Tok
  private[graft] final case class TName(n: String) extends Tok
  private[graft] final case class TArr(items: Seq[Either[String, Double]]) extends Tok
  private[graft] final case class TOp(op: String) extends Tok

  /** Tokenize a content stream: strings (literal + hex, full escape
    * set), numbers, names (so `Tf` font selection is visible),
    * TJ-shaped arrays, operators; dicts and inline images are
    * consumed and dropped. */
  private[graft] def tokenize(s: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private var nextTok: Tok = null
    private def ws(c: Char) = c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
      c == '\f' || c == ' '
    private def delim(c: Char) = "()<>[]{}/%".indexOf(c) >= 0

    private def skipWs(): Unit = {
      while (i < s.length && (ws(s.charAt(i)) || s.charAt(i) == '%')) {
        if (s.charAt(i) == '%') while (i < s.length && s.charAt(i) != '\n') i += 1
        else i += 1
      }
    }
    private def literal(): String = { // at '('
      i += 1
      val sb = new StringBuilder
      var depth = 1
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' =>
              i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0; i += 1
              while (n < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                v = v * 8 + (s.charAt(i) - '0'); i += 1; n += 1
              }
              sb.append((v & 0xff).toChar)
            case other => sb.append(other); i += 2
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) sb.append(c)
          i += 1
        }
      }
      sb.toString
    }
    private def hexStr(): String = { // at '<', not '<<'
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '>') {
        if (!ws(s.charAt(i))) sb.append(s.charAt(i))
        i += 1
      }
      i += 1 // '>'
      val h = if (sb.length % 2 == 1) sb.toString + "0" else sb.toString
      h.grouped(2).map(b => Integer.parseInt(b, 16).toChar).mkString
    }
    private def skipDict(): Unit = { // at '<<'
      var depth = 0
      while (i < s.length) {
        if (s.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (s.startsWith(">>", i)) {
          depth -= 1; i += 2; if (depth == 0) return
        }
        else if (s.charAt(i) == '(') literal()
        else i += 1
      }
    }
    private def number(): Double = {
      val st = i
      if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      s.substring(st, i).toDouble
    }
    private def array(): TArr = { // at '['
      i += 1
      val items = Seq.newBuilder[Either[String, Double]]
      skipWs()
      while (i < s.length && s.charAt(i) != ']') {
        val c = s.charAt(i)
        if (c == '(') items += Left(literal())
        else if (c == '<' && !s.startsWith("<<", i)) items += Left(hexStr())
        else if (c == '-' || c == '+' || c == '.' || c.isDigit) items += Right(number())
        else i += 1 // names etc. — not TJ content
        skipWs()
      }
      i += 1 // ']'
      TArr(items.result())
    }
    private def advance(): Tok = {
      skipWs()
      if (i >= s.length) return null
      val c = s.charAt(i)
      if (c == '(') TStr(literal())
      else if (s.startsWith("<<", i)) { skipDict(); advance() }
      else if (c == '<') TStr(hexStr())
      else if (c == '[') array()
      else if (c == ']') { i += 1; advance() }
      else if (c == '/') { // name token (needed for Tf font tracking)
        i += 1
        val st = i
        while (i < s.length && !ws(s.charAt(i)) && !delim(s.charAt(i))) i += 1
        TName(s.substring(st, i))
      }
      else if (c == '-' || c == '+' || c == '.' || c.isDigit) TNum(number())
      else { // operator
        val st = i
        while (i < s.length && !ws(s.charAt(i)) && !delim(s.charAt(i))) i += 1
        if (i == st) { i += 1; advance() } // stray delimiter
        else {
          val op = s.substring(st, i)
          if (op == "BI") { // inline image: skip to EI
            val ei = s.indexOf("EI", i)
            i = if (ei < 0) s.length else ei + 2
            advance()
          } else TOp(op)
        }
      }
    }
    def hasNext: Boolean = {
      if (nextTok == null) nextTok = advance()
      nextTok != null
    }
    def next(): Tok = {
      if (!hasNext) throw new NoSuchElementException
      val t = nextTok; nextTok = null; t
    }
  }

  /** Assemble a TJ array: strings decode through the active font's
    * CMap and concatenate; an adjustment ≤ −KernSpace reads as a word
    * break (see scaladoc). */
  private def assembleTJ(items: Seq[Either[String, Double]],
      dec: String => String): String = {
    val sb = new StringBuilder
    items.foreach {
      case Left(str) => sb.append(dec(str))
      case Right(kern) => if (kern <= -KernSpace) sb.append(' ')
    }
    sb.toString
  }

  /** Walk one page's content: every shown string with the text-line
    * origin at its show op, in stream order. `Tf` selects the active
    * font; strings of a font with a /ToUnicode CMap decode through it,
    * all others (and text before any Tf) pass through as Latin-1. */
  private def walkContent(content: String,
      fonts: Map[String, CMap] = Map.empty): Seq[(Double, Double, String)] = {
    val out = Seq.newBuilder[(Double, Double, String)]
    var cx = 0.0; var cy = 0.0; var tl = 0.0
    var cmap: CMap = null // null = identity (no /ToUnicode)
    def dec(s: String): String = if (cmap == null) s else cmap.decode(s)
    val stack = scala.collection.mutable.ArrayBuffer[Tok]()
    def num(k: Int): Double = stack.lift(stack.length - k) match {
      case Some(TNum(v)) => v
      case _ => 0.0
    }
    def lastStr: Option[String] = stack.lastOption.collect { case TStr(v) => v }
    def lastArr: Option[Seq[Either[String, Double]]] =
      stack.lastOption.collect { case TArr(v) => v }
    tokenize(content).foreach {
      case TOp("BT") => cx = 0.0; cy = 0.0; tl = 0.0; stack.clear()
      case TOp("Tf") =>
        stack.lift(stack.length - 2) match {
          case Some(TName(f)) => cmap = fonts.getOrElse(f, null)
          case _ => ()
        }
        stack.clear()
      case TOp("Td") => cx += num(2); cy += num(1); stack.clear()
      case TOp("TD") =>
        tl = -num(1); cx += num(2); cy += num(1); stack.clear()
      case TOp("TL") => tl = num(1); stack.clear()
      case TOp("Tm") => cx = num(2); cy = num(1); stack.clear()
      case TOp("T*") => cy -= tl; stack.clear()
      case TOp("Tj") =>
        lastStr.foreach(t => out += ((cx, cy, dec(t)))); stack.clear()
      case TOp("'") =>
        cy -= tl; lastStr.foreach(t => out += ((cx, cy, dec(t)))); stack.clear()
      case TOp("\"") =>
        cy -= tl; lastStr.foreach(t => out += ((cx, cy, dec(t)))); stack.clear()
      case TOp("TJ") =>
        lastArr.foreach(a => out += ((cx, cy, assembleTJ(a, dec)))); stack.clear()
      case TOp(_) => stack.clear() // any other operator consumes operands
      case t => stack += t
    }
    out.result()
  }

  /** Parse one PDF payload to (page, line_no, text) rows. */
  def parsePdf(bytes: Array[Byte]): Seq[(Long, Long, String)] = {
    val doc = new Doc(bytes)
    val cmaps = scala.collection.mutable.Map[Int, Option[CMap]]()
    pageObjs(doc).zipWithIndex.flatMap { case ((pageObj, res), pi) =>
      walkContent(pageContent(doc, pageObj), fontsOf(doc, res, cmaps))
        .zipWithIndex.map {
          case ((_, _, text), li) => ((pi + 1).toLong, li.toLong, text)
        }
    }
  }

  /** Positioned variant: (page, line_no, x, y, text) per show op. */
  def parsePdfPositioned(bytes: Array[Byte]): Seq[(Long, Long, Double, Double, String)] = {
    val doc = new Doc(bytes)
    val cmaps = scala.collection.mutable.Map[Int, Option[CMap]]()
    pageObjs(doc).zipWithIndex.flatMap { case ((pageObj, res), pi) =>
      walkContent(pageContent(doc, pageObj), fontsOf(doc, res, cmaps))
        .zipWithIndex.map {
          case ((x, y, text), li) => ((pi + 1).toLong, li.toLong, x, y, text)
        }
    }
  }

  /** Streams are untrusted input: a preset-dictionary or corrupt stream
    * makes `inflate()` return 0 with neither `finished` nor `needsInput`
    * set (infinite loop without the stall break), and a zip-bomb stream
    * could inflate without bound — cap the output so one hostile file
    * degrades to truncated text instead of OOMing an executor. */
  private val MaxInflatedBytes = 64 << 20

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var stalled = false
    while (!inf.finished() && !inf.needsInput() && !stalled &&
        out.size < MaxInflatedBytes) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n) else stalled = true
    }
    inf.end()
    out.toByteArray
  }

  // ---- writers (fixture generators — also JDK-only) ------------------

  /** Write a minimal real PDF 1.4: catalog → pages → one page object and
    * one FlateDecode content stream per page, each line a `Tj`, with a
    * correct classic xref table. Deflate output is deterministic for a
    * fixed level, so fixture bytes are reproducible. */
  def writePdf(pages: Seq[Seq[String]]): Array[Byte] =
    assemblePdf(pages.map(lines =>
      "BT /F1 12 Tf 72 720 Td\n" +
        lines.map(l => s"(${esc(l)}) Tj 0 -14 Td").mkString("\n") + "\nET"))

  /** Write a PDF with explicitly POSITIONED text: each (x, y, text)
    * cell renders as its own `BT x y Td (text) Tj ET` block, so the
    * text sits at absolute page coordinates (BT resets the text
    * matrix). This is the fixture shape for the table-region scan —
    * the reference's tabula `area=[top,left,bottom,right]` crop
    * (test_uploadPDF.py:31-34) needs geometry to crop against. */
  def writePdfPositioned(pages: Seq[Seq[(Int, Int, String)]]): Array[Byte] =
    assemblePdf(pages.map(cells =>
      cells.map { case (x, y, t) => s"BT /F1 10 Tf $x $y Td (${esc(t)}) Tj ET" }
        .mkString("\n")))

  private def esc(s: String) =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Independent MODERN encoder (PDF 1.5 shapes a real filing uses,
    * deliberately different from `writePdf` so the parser is certified
    * against bytes it did not produce):
    *   - kerned `TJ` arrays — words joined by −250 kerns (word breaks
    *     under the −180 rule), long words split mid-word by a −20 kern
    *     (NOT a break), every other string emitted HEX;
    *   - `Tm` for the first line, `TD`/`T*`/`'` for the line walk;
    *   - `/Contents` as an ARRAY of two streams per page;
    *   - a NESTED page tree (root → two intermediate /Pages nodes);
    *   - catalog + page-tree + page dicts inside an OBJECT STREAM
    *     (type-2 xref entries);
    *   - one content stream's `/Length` as an INDIRECT reference;
    *   - a cross-reference STREAM (/Type /XRef, /W [1 4 2],
    *     /Predictor 12 PNG-Up) instead of a classic table.
    * Deterministic bytes for fixed input. */
  def writePdfModern(pages: Seq[Seq[String]]): Array[Byte] = {
    val n = pages.size
    require(n >= 1, "writePdfModern needs at least one page")
    // object numbers: 1 catalog, 2 root pages, 3/4 intermediate nodes,
    // 5..4+n page dicts (all in the objstm); then per page two content
    // streams; then the indirect-length int, the objstm, the xref stream
    val pageNums = (0 until n).map(5 + _)
    val contNums = (0 until n).map(i => (5 + n + 2 * i, 6 + n + 2 * i))
    val lenObj = 5 + 3 * n
    val objStmNum = 6 + 3 * n
    val xrefNum = 7 + 3 * n
    val size = xrefNum + 1

    def tjLine(line: String, hex: Boolean): String = {
      val parts = line.split(" ", -1).toSeq.flatMap { w =>
        val pieces =
          if (w.length > 4) Seq(w.substring(0, 3), w.substring(3))
          else Seq(w)
        pieces.zipWithIndex.map { case (p, i) => (p, i > 0) } // split-kern flag
      }
      val sb = new StringBuilder("[")
      parts.zipWithIndex.foreach { case ((p, isSplit), i) =>
        if (i > 0) sb.append(if (isSplit) " -20 " else " -250 ")
        if (hex) sb.append("<").append(
          p.getBytes(ISO_8859_1).map(b => f"${b & 0xff}%02X").mkString).append(">")
        else sb.append("(").append(esc(p)).append(")")
      }
      sb.append("] TJ").toString
    }

    def contentFor(lines: Seq[String]): (String, String) = {
      // first line positioned by Tm; TD sets the leading; from there a
      // T*-walk with alternating TJ / ' shows; split into two streams
      val ops = Seq.newBuilder[String]
      ops += "BT"
      ops += "/F1 11 Tf"
      ops += "1 0 0 1 72 720 Tm"
      ops += "0 -14 TD"
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i == 0) ops += tjLine(l, hex = i % 2 == 1)
        else if (i % 3 == 0) ops += s"(${esc(l)}) '"
        else { ops += "T*"; ops += tjLine(l, hex = i % 2 == 1) }
      }
      ops += "ET"
      val all = ops.result()
      val cut = (all.length + 1) / 2
      (all.take(cut).mkString("\n"), all.drop(cut).mkString("\n"))
    }

    val out = new ByteArrayOutputStream()
    def offset = out.size.toLong
    val offsets = scala.collection.mutable.Map[Int, Long]()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.5\n%âãÏÓ\n")

    // content streams (regular objects)
    pages.zipWithIndex.foreach { case (lines, i) =>
      val (s1, s2) = contentFor(lines)
      val (c1, c2) = contNums(i)
      val d1 = deflate(s1.getBytes(ISO_8859_1))
      offsets(c1) = offset
      // first page's first stream exercises the indirect /Length path
      val lenRef = if (i == 0) s"$lenObj 0 R" else s"${d1.length}"
      put(s"$c1 0 obj\n<< /Length $lenRef /Filter /FlateDecode >>\nstream\n")
      out.write(d1); put("\nendstream\nendobj\n")
      if (i == 0) {
        offsets(lenObj) = offset
        put(s"$lenObj 0 obj\n${d1.length}\nendobj\n")
      }
      val d2 = deflate(s2.getBytes(ISO_8859_1))
      offsets(c2) = offset
      put(s"$c2 0 obj\n<< /Length ${d2.length} /Filter /FlateDecode >>\nstream\n")
      out.write(d2); put("\nendstream\nendobj\n")
    }

    // object stream holding the catalog and the whole page tree
    val lo = pageNums.take((n + 1) / 2)
    val hi = pageNums.drop((n + 1) / 2)
    val members: Seq[(Int, String)] =
      Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> (s"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count $n >>"),
        3 -> (s"<< /Type /Pages /Parent 2 0 R /Kids [${lo.map(p => s"$p 0 R").mkString(" ")}] /Count ${lo.size} >>"),
        4 -> (s"<< /Type /Pages /Parent 2 0 R /Kids [${hi.map(p => s"$p 0 R").mkString(" ")}] /Count ${hi.size} >>")
      ) ++ pageNums.zipWithIndex.map { case (p, i) =>
        val (c1, c2) = contNums(i)
        p -> (s"<< /Type /Page /Parent ${if (i < lo.size) 3 else 4} 0 R " +
          s"/MediaBox [0 0 612 792] /Contents [$c1 0 R $c2 0 R] >>")
      }
    val bodies = members.map(_._2)
    val rel = bodies.scanLeft(0)(_ + _.length + 1).init
    val header = members.map(_._1).zip(rel)
      .map { case (num, o) => s"$num $o" }.mkString(" ") + "\n"
    val objStmPayload = header + bodies.mkString("\n") + "\n"
    val objStmDefl = deflate(objStmPayload.getBytes(ISO_8859_1))
    offsets(objStmNum) = offset
    put(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${members.size} " +
      s"/First ${header.length} /Length ${objStmDefl.length} " +
      "/Filter /FlateDecode >>\nstream\n")
    out.write(objStmDefl); put("\nendstream\nendobj\n")

    // xref STREAM: W=[1 4 2], PNG-Up predictor (12)
    val xrefOffset = offset
    offsets(xrefNum) = xrefOffset
    def entry(t: Int, f2: Long, f3: Int): Array[Byte] = {
      val b = new Array[Byte](7)
      b(0) = t.toByte
      b(1) = ((f2 >> 24) & 0xff).toByte; b(2) = ((f2 >> 16) & 0xff).toByte
      b(3) = ((f2 >> 8) & 0xff).toByte; b(4) = (f2 & 0xff).toByte
      b(5) = ((f3 >> 8) & 0xff).toByte; b(6) = (f3 & 0xff).toByte
      b
    }
    val rows: Seq[Array[Byte]] =
      entry(0, 0, 0xffff) +: (1 until size).map { num =>
        if (num <= 4 + n) { // in the object stream
          val idx = members.indexWhere(_._1 == num)
          entry(2, objStmNum.toLong, idx)
        } else entry(1, offsets(num), 0)
      }
    val cols = 7
    val predicted = new ByteArrayOutputStream()
    var prev = new Array[Byte](cols)
    rows.foreach { r =>
      predicted.write(2) // Up filter
      val row = new Array[Byte](cols)
      (0 until cols).foreach(i => row(i) = ((r(i) - prev(i)) & 0xff).toByte)
      predicted.write(row)
      prev = r
    }
    val xrefDefl = deflate(predicted.toByteArray)
    put(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] " +
      s"/Root 1 0 R /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> " +
      s"/Length ${xrefDefl.length} >>\nstream\n")
    out.write(xrefDefl); put("\nendstream\nendobj\n")
    put(s"startxref\n$xrefOffset\n%%EOF\n")
    out.toByteArray
  }

  /** Independent CID-FONT encoder: the file shape a real filing's
    * subsetted fonts use, deliberately written against the spec (not
    * the parser) so the /ToUnicode path is certified on bytes it did
    * not produce:
    *   - `/F1` is a Type0 /Identity-H font whose content-stream bytes
    *     are 2-byte CIDs from a FIXED private coding (a–z → 0x0200+,
    *     A–Z → 0x0300+, the "fi" ligature → one code 0x0500, all other
    *     chars → 0x0400+rank) — unreadable without the CMap;
    *   - the /ToUnicode CMap exercises every section form: a
    *     codespacerange, an INCREMENTED bfrange (a–z), an ARRAY-form
    *     bfrange (A–Z), bfchar pairs, and a multi-UTF16-unit dst
    *     (the ligature);
    *   - `/F2` is a plain Type1 font with NO /ToUnicode (Latin-1
    *     passthrough) — lines alternate fonts, so `Tf` tracking is
    *     load-bearing;
    *   - `/Resources` sits ONLY on the root /Pages node (inheritance);
    *   - each page's first F1 line shows as a kerned TJ (word break
    *     under the −180 rule) when it contains a space.
    * Classic xref, FlateDecode content, deterministic bytes. */
  def writePdfCid(pages: Seq[Seq[String]]): Array[Byte] = {
    val n = pages.size
    require(n >= 1, "writePdfCid needs at least one page")
    // the F1 (CID) lines are the odd-indexed lines of every page
    val cidLines = pages.flatMap(_.zipWithIndex.collect {
      case (l, i) if i % 2 == 1 => l
    })
    val others = cidLines.flatMap(_.replace("fi", "")).toSet
      .filterNot(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
      .toSeq.sorted
    val otherIdx = others.zipWithIndex.toMap
    def cids(text: String): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var i = 0
      while (i < text.length) {
        if (text.startsWith("fi", i)) { out += 0x0500; i += 2 }
        else {
          val c = text.charAt(i)
          out += (
            if (c >= 'a' && c <= 'z') 0x0200 + (c - 'a')
            else if (c >= 'A' && c <= 'Z') 0x0300 + (c - 'A')
            else 0x0400 + otherIdx(c))
          i += 1
        }
      }
      out.result()
    }
    def hex(codes: Seq[Int]): String =
      codes.map(c => f"$c%04X").mkString("<", "", ">")
    val cmapText = {
      val sb = new StringBuilder
      sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
      sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
      sb.append("1 beginbfrange\n<0200> <0219> <0061>\nendbfrange\n")
      sb.append("1 beginbfrange\n<0300> <0319> [")
      sb.append(('A' to 'Z').map(c => f"<${c.toInt}%04X>").mkString(" "))
      sb.append("]\nendbfrange\n")
      val bfchars = others.zipWithIndex.map { case (c, i) =>
        f"<${0x0400 + i}%04X> <${c.toInt}%04X>"
      } :+ "<0500> <00660069>" // the fi ligature, two UTF-16 units
      sb.append(s"${bfchars.size} beginbfchar\n")
      sb.append(bfchars.mkString("\n"))
      sb.append("\nendbfchar\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
      sb.toString
    }
    def contentFor(lines: Seq[String]): String = {
      val ops = Seq.newBuilder[String]
      ops += "BT"
      ops += "72 720 Td"
      var firstCid = true
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i % 2 == 1) {
          ops += "/F1 11 Tf"
          val sp = l.indexOf(' ')
          if (firstCid && sp > 0) {
            ops += s"[${hex(cids(l.substring(0, sp)))} -250 ${hex(cids(l.substring(sp + 1)))}] TJ"
            firstCid = false
          } else ops += s"${hex(cids(l))} Tj"
        } else {
          ops += "/F2 11 Tf"
          ops += s"(${esc(l)}) Tj"
        }
        ops += "0 -14 Td"
      }
      ops += "ET"
      ops.result().mkString("\n")
    }
    // objects: 1 catalog, 2 root pages (carrying /Resources), pages,
    // contents, F1, CMap stream, F2
    val pageNums = (0 until n).map(3 + _)
    val contNums = (0 until n).map(3 + n + _)
    val f1Num = 3 + 2 * n; val cmapNum = 4 + 2 * n; val f2Num = 5 + 2 * n
    val body = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    body.append("%PDF-1.4\n")
    def obj(num: Int, content: String): Unit = {
      offsets += body.length
      body.append(s"$num 0 obj\n$content\nendobj\n")
    }
    def streamObj(num: Int, data: Array[Byte]): Unit = {
      val d = deflate(data)
      offsets += body.length
      body.append(s"$num 0 obj\n<< /Length ${d.length} /Filter /FlateDecode >>\nstream\n")
      body.append(new String(d, ISO_8859_1))
      body.append("\nendstream\nendobj\n")
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, s"<< /Type /Pages /Kids [${pageNums.map(p => s"$p 0 R").mkString(" ")}] " +
      s"/Count $n /Resources << /Font << /F1 $f1Num 0 R /F2 $f2Num 0 R >> >> >>")
    pageNums.zip(contNums).foreach { case (p, c) =>
      obj(p, s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $c 0 R >>")
    }
    pages.zip(contNums).foreach { case (lines, c) =>
      streamObj(c, contentFor(lines).getBytes(ISO_8859_1))
    }
    obj(f1Num, "<< /Type /Font /Subtype /Type0 /BaseFont /GRAFT+Subset " +
      s"/Encoding /Identity-H /ToUnicode $cmapNum 0 R >>")
    streamObj(cmapNum, cmapText.getBytes(ISO_8859_1))
    obj(f2Num, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val xrefPos = body.length
    val nObjs = f2Num
    body.append(s"xref\n0 ${nObjs + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => body.append(f"$o%010d 00000 n \n"))
    body.append(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    body.toString.getBytes(ISO_8859_1)
  }

  private def assemblePdf(streams: Seq[String]): Array[Byte] = {
    val nPages = streams.size
    // object numbering: 1 catalog, 2 pages, then (3+2i) page / (4+2i) content
    val pageObjNums = (0 until nPages).map(i => 3 + 2 * i)
    val body = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    body.append("%PDF-1.4\n")
    def obj(num: Int, content: String): Unit = {
      offsets += body.length
      body.append(s"$num 0 obj\n$content\nendobj\n")
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>")
    streams.zipWithIndex.foreach { case (streamText, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      obj(pageNum, s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $contNum 0 R >>")
      val deflated = deflate(streamText.getBytes(ISO_8859_1))
      offsets += body.length
      body.append(s"$contNum 0 obj\n<< /Length ${deflated.length} /Filter /FlateDecode >>\nstream\n")
      body.append(new String(deflated, ISO_8859_1))
      body.append("\nendstream\nendobj\n")
    }
    val xrefPos = body.length
    val nObjs = 2 + 2 * nPages
    body.append(s"xref\n0 ${nObjs + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => body.append(f"$o%010d 00000 n \n"))
    body.append(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    body.toString.getBytes(ISO_8859_1)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_COMPRESSION)
    d.setInput(data)
    d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
