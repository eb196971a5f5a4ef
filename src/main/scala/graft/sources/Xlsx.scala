package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.XMLInputFactory

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real binary XLSX source — the reference's entire ingest is
  * `pd.read_excel` over uploaded workbooks (mainTesting.py:456-458) plus
  * sheet discovery by content (`cari_sheet_excel`, mainTesting.py:379-389);
  * round 1 modeled only the post-extraction relational shape. This closes
  * the gap with an actual binary connector: XLSX is a zip of XML parts, so
  * the JDK alone (ZipInputStream + StAX) reads it — no external library.
  *
  * Supported surface (deliberately the subset the reference exercises):
  * multi-sheet workbooks, shared strings, inline strings, raw numeric
  * cells. Dates/styles/formulas are out of scope — the reference reads
  * values, not formats.
  *
  * Spark integration: `spark.read.format("binaryFile")` yields one row per
  * file (path + payload); parsing is a per-file `flatMap` on executors, so
  * a directory of N workbooks parallelizes N-ways and the binary payload
  * never shuffles — only parsed cells (a few strings per row) move. At
  * 100 TB of workbooks the scan stage IS the extraction stage. Cells are
  * surfaced in the long (file, sheet, row, col, value) shape — the same
  * unpivoted form the reference's row loops consume — and relational
  * pivots downstream are ordinary engine queries.
  */
object Xlsx {

  /** `sheet_idx` is the sheet's 1-based position in the workbook's
    * declared order (workbook.xml), NOT alphabetical — the reference's
    * sheet walk (`cari_sheet_excel`, mainTesting.py:379-389) iterates
    * declaration order, so discovery must too. */
  case class Cell(file: String, sheet: String, sheet_idx: Long,
      row_idx: Long, col_idx: Long, value: String)

  /** Read every *.xlsx under `dir` into the long cell shape. */
  def read(spark: SparkSession, dir: String): Dataset[Cell] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.xlsx")
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parseWorkbook(bytes).map { case (sheet, si, r, c, v) =>
          Cell(name, sheet, si, r, c, v)
        }
      }
  }

  /** Reference `cari_sheet_excel`: the first sheet — file order, then
    * workbook DECLARED sheet order — whose content contains `keyword`,
    * case-insensitively. */
  def discoverSheet(spark: SparkSession, dir: String, keyword: String): DataFrame = {
    import spark.implicits._
    read(spark, dir)
      .filter(lower($"value").contains(keyword.toLowerCase))
      .groupBy($"file", $"sheet_idx", $"sheet")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy($"file", $"sheet_idx")
      .limit(1)
      .select($"file", $"sheet", $"n_hits")
  }

  // ---- parser (executor-side, JDK-only) -----------------------------

  /** Parse one workbook payload to (sheetName, sheetIdx, row, col,
    * value) cells, in declared sheet order then document order;
    * sheetIdx is the 1-based declared position. */
  def parseWorkbook(bytes: Array[Byte]): Seq[(String, Long, Long, Long, String)] = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(IndexedSeq.empty)
    val rels = parts.get("xl/_rels/workbook.xml.rels").map(parseRels)
      .getOrElse(Map.empty)
    val sheets = parts.get("xl/workbook.xml").map(parseSheetList)
      .getOrElse(Seq.empty)
    sheets.zipWithIndex.flatMap { case ((sheetName, rid), i) =>
      val target = rels.getOrElse(rid, "")
      val part = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      parts.get(part).toSeq.flatMap { sheetXml =>
        parseSheet(sheetXml, shared).map { case (r, c, v) =>
          (sheetName, (i + 1).toLong, r, c, v)
        }
      }
    }
  }

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  private def reader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // the payload is untrusted input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** workbook.xml → (name, r:id) per sheet, in declared order. */
  private def parseSheetList(bytes: Array[Byte]): Seq[(String, String)] = {
    val r = reader(bytes)
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT
          && r.getLocalName == "sheet") {
        var name = ""; var rid = ""
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id"   => rid = r.getAttributeValue(i) // r:id
            case _      =>
          }
        }
        out += name -> rid
      }
    }
    r.close()
    out.result()
  }

  /** workbook.xml.rels → rId → worksheet target path. */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val r = reader(bytes)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT
          && r.getLocalName == "Relationship") {
        var id = ""; var target = ""
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "Id"     => id = r.getAttributeValue(i)
            case "Target" => target = r.getAttributeValue(i)
            case _        =>
          }
        }
        out += id -> target
      }
    }
    r.close()
    out.result()
  }

  /** sharedStrings.xml → index-ordered strings (one <t> per <si> in the
    * subset we emit; rich-text runs would concatenate). */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = reader(bytes)
    val out = IndexedSeq.newBuilder[String]
    val sb = new StringBuilder
    var inSi = false; var inT = false
    while (r.hasNext) r.next() match {
      case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "si" => inSi = true; sb.clear()
          case "t" if inSi => inT = true
          case _ =>
        }
      case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
        sb.append(r.getText)
      case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "t" if inSi => inT = false
          case "si" => inSi = false; out += sb.toString
          case _ =>
        }
      case _ =>
    }
    r.close()
    out.result()
  }

  /** worksheet XML → (row, col, value) per cell. Cell type attr `t`:
    * "s" = shared-string index, "inlineStr" = <is><t>, otherwise the
    * raw <v> text (numbers keep their lexical form — no float reparse,
    * so the value survives engine-to-engine comparison exactly). */
  private def parseSheet(bytes: Array[Byte],
      shared: IndexedSeq[String]): Seq[(Long, Long, String)] = {
    val r = reader(bytes)
    val out = Seq.newBuilder[(Long, Long, String)]
    var cellRef = ""; var cellType = ""
    var inV = false; var inIsT = false
    val sb = new StringBuilder
    def emit(): Unit = if (cellRef.nonEmpty && sb.nonEmpty) {
      val (row, col) = splitRef(cellRef)
      // a malformed or out-of-range shared-string index (corrupt
      // workbook) degrades to the raw index text instead of throwing —
      // one bad file must not kill a whole directory scan
      val v =
        if (cellType == "s")
          sb.toString.trim.toIntOption.flatMap(shared.lift).getOrElse(sb.toString)
        else sb.toString
      out += ((row, col, v))
    }
    while (r.hasNext) r.next() match {
      case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "c" =>
            cellRef = ""; cellType = ""; sb.clear()
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "r" => cellRef = r.getAttributeValue(i)
                case "t" => cellType = r.getAttributeValue(i)
                case _   =>
              }
            }
          case "v" => inV = true
          case "t" if cellType == "inlineStr" => inIsT = true
          case _ =>
        }
      case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inIsT =>
        sb.append(r.getText)
      case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "v" => inV = false
          case "t" if inIsT => inIsT = false
          case "c" => emit(); cellRef = ""
          case _ =>
        }
      case _ =>
    }
    r.close()
    out.result()
  }

  /** "BC12" → (12, 55): column letters are base-26 with A=1. */
  private[graft] def splitRef(ref: String): (Long, Long) = {
    val letters = ref.takeWhile(_.isLetter)
    val digits = ref.drop(letters.length)
    val col = letters.foldLeft(0L)((acc, ch) => acc * 26 + (ch - 'A' + 1))
    (digits.toLong, col)
  }

  // ---- writer (fixture generator — also JDK-only) -------------------

  /** A cell for the fixture writer: `num=true` emits a raw numeric
    * <v>; otherwise the string goes through sharedStrings (even index)
    * or inline (odd index) to exercise both paths. */
  case class W(text: String, num: Boolean = false)

  /** Write a minimal real workbook: [Content_Types], rels, workbook,
    * sharedStrings, one part per sheet. Fixed zip timestamps keep the
    * bytes deterministic run-to-run. */
  def writeWorkbook(sheets: Seq[(String, Seq[Seq[W]])]): Array[Byte] = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sharedList = sheets.flatMap(_._2.flatten).filter(!_.num)
      .map(_.text).distinct.zipWithIndex
    val shared = sharedList.toMap
    val sheetXml = sheets.zipWithIndex.map { case ((_, rows), _) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.collect {
          case (W(t, num), ci) if t.nonEmpty =>
            val ref = s"${colName(ci + 1)}${ri + 1}"
            if (num) s"""<c r="$ref"><v>${esc(t)}</v></c>"""
            else if (shared(t) % 2 == 0)
              s"""<c r="$ref" t="s"><v>${shared(t)}</v></c>"""
            else s"""<c r="$ref" t="inlineStr"><is><t>${esc(t)}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }
    val wbSheets = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$wbSheets</sheets></workbook>"""
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    val relsXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>"""
    val sstXml = {
      val sis = sharedList.map { case (t, _) => s"<si><t>${esc(t)}</t></si>" }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedList.size}" uniqueCount="${sharedList.size}">$sis</sst>"""
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/></Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L)
      zos.putNextEntry(e)
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("_rels/.rels", rootRels)
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", relsXml)
    put("xl/sharedStrings.xml", sstXml)
    sheetXml.zipWithIndex.foreach { case (xml, i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    zos.close()
    bos.toByteArray
  }

  private[graft] def colName(col: Long): String = {
    var c = col; val sb = new StringBuilder
    while (c > 0) { val r = ((c - 1) % 26).toInt; sb.insert(0, ('A' + r).toChar); c = (c - 1) / 26 }
    sb.toString
  }
}
