package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real binary PDF page-text source — the reference reads filings with
  * fitz: per-page `get_text()` plus keyword page search
  * (mainTesting.py:217-254, 273-285); round 1 modeled only the
  * post-extraction (doc, page, line, text) shape. This is an actual
  * binary reader for the subset those calls exercise: page tree in
  * /Kids order, FlateDecode content streams (java.util.zip.Inflater —
  * JDK-only), text from `(...) Tj` show-text operators with PDF string
  * escapes. Fonts, encodings beyond Latin-1, kerned TJ arrays, and
  * layout reconstruction are out of scope — the reference consumes
  * plain extracted lines, not geometry.
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
    * the moment of its `Tj`. Works on both writer shapes — absolute
    * per-cell `BT x y Td` blocks and the relative `0 -14 Td` line walk
    * (Td offsets accumulate within a BT/ET block, per the spec). */
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

  /** Parse one PDF payload to (page, line_no, text) rows. Pages come
    * from the catalog's /Pages → /Kids order; each page's /Contents
    * stream is inflated if /Filter /FlateDecode, then every `(...) Tj`
    * becomes one line. */
  def parsePdf(bytes: Array[Byte]): Seq[(Long, Long, String)] = {
    val raw = new String(bytes, ISO_8859_1) // byte-preserving view
    val objs = objectMap(raw)
    def dictOf(num: Int): String = objs.getOrElse(num, "")
    val catalog = objs.collectFirst {
      case (_, body) if body.contains("/Type /Catalog") => body
    }.getOrElse("")
    val pagesRef = ref(catalog, "/Pages").getOrElse(return Seq.empty)
    val kids = "(\\d+) 0 R".r.findAllMatchIn(
      "/Kids \\[([^\\]]*)\\]".r.findFirstMatchIn(dictOf(pagesRef)).map(_.group(1)).getOrElse("")
    ).map(_.group(1).toInt).toSeq
    kids.zipWithIndex.flatMap { case (pageObj, pi) =>
      val contentRef = ref(dictOf(pageObj), "/Contents")
      val content = contentRef.map(n => streamOf(raw, n)).getOrElse(Array.empty[Byte])
      val text = new String(content, ISO_8859_1)
      val lines = "\\((?:\\\\.|[^\\\\)])*\\)\\s*Tj".r.findAllMatchIn(text)
        .map(m => unescape(m.matched.dropRight(2).trim.stripPrefix("(").stripSuffix(")")))
        .toSeq
      lines.zipWithIndex.map { case (l, li) => ((pi + 1).toLong, li.toLong, l) }
    }
  }

  /** Positioned variant of `parsePdf`: walks the content stream's
    * operators IN ORDER, tracking the text-line origin — `BT` resets
    * it, `tx ty Td` translates it, `(s) Tj` emits (page, line_no, x,
    * y, text). Covers the operator subset both writers emit; unknown
    * operators pass through harmlessly because only these three match.
    */
  def parsePdfPositioned(bytes: Array[Byte]): Seq[(Long, Long, Double, Double, String)] = {
    val raw = new String(bytes, ISO_8859_1)
    val objs = objectMap(raw)
    def dictOf(num: Int): String = objs.getOrElse(num, "")
    val catalog = objs.collectFirst {
      case (_, body) if body.contains("/Type /Catalog") => body
    }.getOrElse("")
    val pagesRef = ref(catalog, "/Pages").getOrElse(return Seq.empty)
    val kids = "(\\d+) 0 R".r.findAllMatchIn(
      "/Kids \\[([^\\]]*)\\]".r.findFirstMatchIn(dictOf(pagesRef)).map(_.group(1)).getOrElse("")
    ).map(_.group(1).toInt).toSeq
    val tok = ("(-?[0-9.]+)\\s+(-?[0-9.]+)\\s+Td" +
      "|\\((?:\\\\.|[^\\\\)])*\\)\\s*Tj|BT").r
    kids.zipWithIndex.flatMap { case (pageObj, pi) =>
      val contentRef = ref(dictOf(pageObj), "/Contents")
      val content = contentRef.map(n => streamOf(raw, n)).getOrElse(Array.empty[Byte])
      val text = new String(content, ISO_8859_1)
      var cx = 0.0; var cy = 0.0; var ln = 0L
      tok.findAllMatchIn(text).flatMap { m =>
        m.matched match {
          case "BT" => cx = 0.0; cy = 0.0; None
          case s if s.endsWith("Td") =>
            cx += m.group(1).toDouble; cy += m.group(2).toDouble; None
          case s => // (...) Tj
            val t = unescape(s.stripSuffix("Tj").trim.stripPrefix("(").stripSuffix(")"))
            val row = ((pi + 1).toLong, ln, cx, cy, t)
            ln += 1
            Some(row)
        }
      }.toSeq
    }
  }

  /** All `N 0 obj ... endobj` bodies by object number (dict part only
    * is fine for refs; stream payloads are sliced separately by
    * /Length, because compressed bytes may contain "endobj"). */
  private def objectMap(raw: String): Map[Int, String] = {
    "(?s)(\\d+) 0 obj(.*?)(?:stream|endobj)".r.findAllMatchIn(raw)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
  }

  private def ref(dict: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + "\\s+(\\d+) 0 R").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Exact stream payload of object `num`: located by the object
    * header, sliced by its /Length, inflated when FlateDecode. */
  private def streamOf(raw: String, num: Int): Array[Byte] = {
    val header = s"(?s)(?<!\\d)$num 0 obj(.*?)stream\r?\n".r
    header.findFirstMatchIn(raw) match {
      case None => Array.empty
      case Some(m) =>
        val dict = m.group(1)
        val len = "/Length\\s+(\\d+)".r.findFirstMatchIn(dict)
          .map(_.group(1).toInt).getOrElse(0)
        val data = raw.substring(m.end, m.end + len).getBytes(ISO_8859_1)
        if (dict.contains("/FlateDecode")) inflate(data) else data
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

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---- writer (fixture generator — also JDK-only) -------------------

  /** Write a minimal real PDF: catalog → pages → one page object and
    * one FlateDecode content stream per page, each line a `Tj`, with a
    * correct xref table. Deflate output is deterministic for a fixed
    * level, so fixture bytes are reproducible. */
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
