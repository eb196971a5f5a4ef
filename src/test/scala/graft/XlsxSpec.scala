package graft

import graft.queries.Media
import graft.sources.Xlsx
import graft.sources.Xlsx.W

class XlsxSpec extends SparkSpec {

  private def dir = Media.writeXlsxFixture("/tmp/graft-xlsx-spec")

  test("parser round-trips the writer's workbooks cell-for-cell") {
    val got = Xlsx.read(spark, dir).toDF()
      .orderBy("file", "sheet", "row_idx", "col_idx")
      .collect().map(_.toSeq).toSeq
    val want = Media.xlsxExpected(spark)
      .orderBy("file", "sheet", "row_idx", "col_idx")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("cell ref arithmetic: multi-letter columns, both directions") {
    assert(Xlsx.splitRef("A1") == (1L, 1L))
    assert(Xlsx.splitRef("Z9") == (9L, 26L))
    assert(Xlsx.splitRef("AB12") == (12L, 28L))
    assert(Xlsx.splitRef("BC120") == (120L, 55L))
    assert(Xlsx.colName(1) == "A")
    assert(Xlsx.colName(26) == "Z")
    assert(Xlsx.colName(28) == "AB")
    assert(Xlsx.colName(703) == "AAA")
    (1L to 1000L).foreach { c =>
      assert(Xlsx.splitRef(s"${Xlsx.colName(c)}7") == (7L, c))
    }
  }

  test("shared and inline strings parse identically; escapes survive") {
    val bytes = Xlsx.writeWorkbook(Seq(
      "S" -> Seq(Seq(W("a&b <c>"), W("x"), W("y"), W("z")))))
    val cells = Xlsx.parseWorkbook(bytes)
    assert(cells.map(_._5) == Seq("a&b <c>", "x", "y", "z"))
    assert(cells.map(c => (c._3, c._4)) == Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("sheet order follows workbook declaration, not part names") {
    val bytes = Xlsx.writeWorkbook(Seq(
      "Zulu" -> Seq(Seq(W("1", num = true))),
      "Alpha" -> Seq(Seq(W("2", num = true)))))
    assert(Xlsx.parseWorkbook(bytes).map(_._1) == Seq("Zulu", "Alpha"))
    assert(Xlsx.parseWorkbook(bytes).map(_._2) == Seq(1L, 2L))
  }

  test("discoverSheet finds the first sheet containing the keyword") {
    val row = Xlsx.discoverSheet(spark, dir, "laba").collect()
    assert(row.length == 1)
    assert(row(0).getString(0) == "fin_2023.xlsx")
    assert(row(0).getString(1) == "Laporan Laba Rugi")
  }

  test("discoverSheet walks DECLARED sheet order, not alphabetical") {
    // reference cari_sheet_excel (mainTesting.py:379-389) iterates the
    // workbook's declared sheet order; "Zulu" declares first and must
    // win even though "Alpha" sorts first by name
    val d = new java.io.File("/tmp/graft-xlsx-order-spec")
    d.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(d, "order.xlsx").toPath,
      Xlsx.writeWorkbook(Seq(
        "Zulu" -> Seq(Seq(W("laba zulu"))),
        "Alpha" -> Seq(Seq(W("laba alpha"))))))
    val row = Xlsx.discoverSheet(spark, d.getAbsolutePath, "laba").collect()
    assert(row.length == 1)
    assert(row(0).getString(1) == "Zulu")
  }

  test("corrupt shared-string index degrades to raw text, not a crash") {
    val good = Xlsx.writeWorkbook(Seq("S" -> Seq(Seq(W("ok")))))
    // point the cell at shared-string index 999 (out of range)
    val broken = {
      val parts = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(good))
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      var e = parts.getNextEntry
      while (e != null) {
        val bytes = parts.readAllBytes()
        val out =
          if (e.getName == "xl/worksheets/sheet1.xml")
            new String(bytes, "UTF-8").replace("<v>0</v>", "<v>999</v>")
              .getBytes("UTF-8")
          else bytes
        val ne = new java.util.zip.ZipEntry(e.getName)
        ne.setTime(0L)
        zos.putNextEntry(ne)
        zos.write(out)
        zos.closeEntry()
        e = parts.getNextEntry
      }
      zos.close()
      bos.toByteArray
    }
    assert(Xlsx.parseWorkbook(broken).map(_._5) == Seq("999"))
  }

  test("payload never shuffles: plan reads binary, exchanges only cells") {
    val df = Xlsx.read(spark, dir).toDF()
      .groupBy("file", "sheet").count()
    val plan = df.queryExecution.executedPlan.toString
    // the only wide op is over the small parsed projection: every
    // Exchange partitions on parsed-cell columns, never the payload
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    exchanges.foreach { ex =>
      assert(ex.contains("file") || ex.contains("sheet"), ex)
      assert(!ex.contains("content"), ex)
    }
  }

  test("rows and cells without r attributes infer sequential positions (ECMA-376 optional-r rule)") {
    // real streaming writers omit r= entirely; strip every position
    // attribute from a written sheet and the parse must be unchanged
    val sheets = Seq("S" -> Seq(
      Seq(W("a"), W("b"), W("1.5", num = true)),
      Seq(W("c"), W("d"), W("2023-01-01", date = true))))
    val withRefs = Xlsx.parseWorkbook(Xlsx.writeWorkbook(sheets))
    val strippedZip = {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(Xlsx.writeWorkbook(sheets)))
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      var e = zin.getNextEntry
      while (e != null) {
        val bytes = zin.readAllBytes()
        val out =
          if (e.getName.startsWith("xl/worksheets/"))
            new String(bytes, "UTF-8")
              .replaceAll("""(<(?:row|c)\b[^>]*?) r="[A-Z0-9]+"""", "$1")
              .getBytes("UTF-8")
          else bytes
        zos.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        zos.write(out)
        zos.closeEntry()
        e = zin.getNextEntry
      }
      zin.close(); zos.close()
      bos.toByteArray
    }
    assert(withRefs.nonEmpty && Xlsx.parseWorkbook(strippedZip) === withRefs)
  }

  test("1900-system date serials: epoch rule, the phantom 1900-02-29, time fractions — both directions") {
    // the epoch quirk, pinned value by value
    assert(Xlsx.serialToIso(1) === "1900-01-01")
    assert(Xlsx.serialToIso(59) === "1900-02-28")
    assert(Xlsx.serialToIso(60) === "1900-02-29") // Excel's phantom leap day
    assert(Xlsx.serialToIso(61) === "1900-03-01")
    assert(Xlsx.serialToIso(44927) === "2023-01-01")
    assert(Xlsx.serialToIso(45366.520891204) === "2024-03-15 12:30:05")
    // inverse round-trips, including across the phantom day
    Seq("1900-01-01", "1900-02-28", "1900-02-29", "1900-03-01",
        "2023-01-01", "2024-03-15 12:30:05").foreach { iso =>
      assert(Xlsx.serialToIso(Xlsx.isoToSerial(iso)) === iso, iso)
    }
  }

  test("1904-system books (workbookPr date1904) read serials from the Mac epoch, no phantom day") {
    // the unit rule first
    assert(Xlsx.serialToIso(0, date1904 = true) === "1904-01-01")
    assert(Xlsx.serialToIso(100, date1904 = true) === "1904-04-10")
    assert(Xlsx.serialToIso(43465, date1904 = true) === "2023-01-01")
    assert(Xlsx.serialToIso(43465.5, date1904 = true) === "2023-01-01 12:00:00")
    // then end-to-end: the same workbook bytes with the flag injected
    // into workbook.xml shift every date-styled cell by the epoch gap
    // writeWorkbook encodes date cells from ISO via the 1900 rule:
    // "2018-12-31" → serial 43465, which the 1904 reading shifts +1462d
    val sheets = Seq("S" -> Seq(Seq(W("2018-12-31", date = true))))
    val plain = Xlsx.writeWorkbook(sheets)
    assert(Xlsx.parseWorkbook(plain).map(_._5) === Seq("2018-12-31")) // 1900 system, 1462d earlier
    val flagged = {
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(plain))
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      var e = zin.getNextEntry
      while (e != null) {
        val bytes = zin.readAllBytes()
        val out =
          if (e.getName == "xl/workbook.xml")
            new String(bytes, "UTF-8")
              .replaceFirst("<sheets>", """<workbookPr date1904="1"/><sheets>""")
              .getBytes("UTF-8")
          else bytes
        zos.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        zos.write(out)
        zos.closeEntry()
        e = zin.getNextEntry
      }
      zin.close(); zos.close()
      bos.toByteArray
    }
    assert(Xlsx.parseWorkbook(flagged).map(_._5) === Seq("2023-01-01"))
  }

  test("boolean, error, and formula cells surface their display values") {
    // rewrite a written sheet's cells into the t=b / t=e / formula
    // shapes real filings carry — the fixture writer stays simple
    val base = Xlsx.writeWorkbook(Seq("S" -> Seq(Seq(W("x", num = true)))))
    val rewritten = {
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(base))
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      var e = zin.getNextEntry
      while (e != null) {
        val bytes = zin.readAllBytes()
        val out =
          if (e.getName.startsWith("xl/worksheets/"))
            new String(bytes, "UTF-8")
              .replaceFirst("<c [^>]*><v>x</v></c>",
                """<c r="A1" t="b"><v>1</v></c>""" +
                """<c r="B1" t="b"><v>0</v></c>""" +
                """<c r="C1" t="e"><v>#DIV/0!</v></c>""" +
                """<c r="D1" t="str"><f>CONCAT("a","b")</f><v>ab</v></c>""" +
                """<c r="E1"><f>1+41</f><v>42</v></c>""")
              .getBytes("UTF-8")
          else bytes
        zos.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        zos.write(out)
        zos.closeEntry()
        e = zin.getNextEntry
      }
      zin.close(); zos.close()
      bos.toByteArray
    }
    // booleans render as TRUE/FALSE, errors and cached formula values
    // pass through, and formula TEXT never leaks into the value
    assert(Xlsx.parseWorkbook(rewritten).map(c => (c._4, c._5)) ===
      Seq((1L, "TRUE"), (2L, "FALSE"), (3L, "#DIV/0!"), (4L, "ab"), (5L, "42")))
  }

  test("rich-text shared strings concatenate runs; phonetic runs are excluded") {
    val base = Xlsx.writeWorkbook(Seq("S" -> Seq(Seq(W("placeholder")))))
    val rewritten = {
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(base))
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      var e = zin.getNextEntry
      while (e != null) {
        val bytes = zin.readAllBytes()
        val out =
          if (e.getName == "xl/sharedStrings.xml")
            new String(bytes, "UTF-8")
              .replaceFirst("<si><t>placeholder</t></si>",
                "<si><r><rPr><b/></rPr><t>Laba </t></r><r><t>bersih</t></r>" +
                  "<rPh sb=\"0\" eb=\"2\"><t>ふりがな</t></rPh></si>")
              .getBytes("UTF-8")
          else bytes
        zos.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        zos.write(out)
        zos.closeEntry()
        e = zin.getNextEntry
      }
      zin.close(); zos.close()
      bos.toByteArray
    }
    assert(Xlsx.parseWorkbook(rewritten).map(_._5) === Seq("Laba bersih"))
  }

  test("date-styled cells surface as ISO text; unstyled numerics keep their lexical form") {
    val bytes = Xlsx.writeWorkbook(Seq("S" -> Seq(
      Seq(W("tanggal"), W("2023-06-30", date = true)),
      Seq(W("nilai"), W("44927", num = true))))) // same digits, NOT a date
    val cells = Xlsx.parseWorkbook(bytes)
      .map { case (_, _, r, c, v) => (r, c, v) }.toSet
    assert(cells.contains((1L, 2L, "2023-06-30")))
    assert(cells.contains((2L, 2L, "44927"))) // no style → raw serial text
  }

  test("custom numFmt date codes are recognized; quoted literals in codes are not") {
    val styles = """<?xml version="1.0"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="2"><numFmt numFmtId="164" formatCode="dd/mm/yyyy"/>
<numFmt numFmtId="165" formatCode="&quot;dy&quot; 0.00"/></numFmts>
<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="165"/></cellXfs>
</styleSheet>""".getBytes("UTF-8")
    // xf 1 → custom date format; xf 2's only date letters live inside a
    // quoted literal and must NOT mark it as a date
    assert(Xlsx.parseDateStyles(styles) === Set(1))
  }

  test("writeXlsx exports a DataFrame as a real workbook: header + typed cells, loud over maxRows") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 10.5, java.sql.Date.valueOf("2023-01-01")),
      (2L, "beta", -3.25, java.sql.Date.valueOf("2024-03-15")))
      .toDF("id", "name", "score", "day")
    val dir = graft.util.Scratch.dir("xlsx_sink_spec")
    graft.sources.Sources.writeXlsx(df.orderBy("id"), s"$dir/out.xlsx", "Hasil")
    val cells = Xlsx.read(spark, dir).toDF()
      .filter($"file" === "out.xlsx")
      .select($"sheet", $"row_idx", $"col_idx", $"value")
      .as[(String, Long, Long, String)].collect().toSet
    assert(cells === Set(
      ("Hasil", 1L, 1L, "id"), ("Hasil", 1L, 2L, "name"),
      ("Hasil", 1L, 3L, "score"), ("Hasil", 1L, 4L, "day"),
      ("Hasil", 2L, 1L, "1"), ("Hasil", 2L, 2L, "alpha"),
      ("Hasil", 2L, 3L, "10.5"), ("Hasil", 2L, 4L, "2023-01-01"),
      ("Hasil", 3L, 1L, "2"), ("Hasil", 3L, 2L, "beta"),
      ("Hasil", 3L, 3L, "-3.25"), ("Hasil", 3L, 4L, "2024-03-15")))
    // dates really go through styles.xml serials, not strings: the raw
    // sheet XML must carry the serial, not the ISO text
    val zin = new java.util.zip.ZipInputStream(
      new java.io.FileInputStream(s"$dir/out.xlsx"))
    var sheetXml = ""
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/worksheets/sheet1.xml")
        sheetXml = new String(zin.readAllBytes(), "UTF-8")
      e = zin.getNextEntry
    }
    zin.close()
    assert(sheetXml.contains("<v>44927</v>") && !sheetXml.contains("2023-01-01"))
    // the row fence is loud
    val big = spark.range(0, 50).toDF("id")
    val err = intercept[IllegalArgumentException] {
      graft.sources.Sources.writeXlsx(big, s"$dir/big.xlsx", maxRows = 10)
    }
    assert(err.getMessage.contains("maxRows"))
  }

  test("merged regions anchor-fill covered cells and surface as metadata; the KV pivot keeps its key") {
    import graft.sources.Xlsx
    import Xlsx.W
    // a metadata sheet whose KEY cell spans two rows (A2:A3) and whose
    // title spans three columns (A1:C1) — the anchor holds the value,
    // covered cells are absent from the XML, exactly what Excel writes
    val bytes = Xlsx.writeWorkbook(
      Seq("Meta" -> Seq(
        Seq(W("JUDUL LAPORAN")),
        Seq(W("Periode"), W("2024")),
        Seq(W(""), W("triwulan-1")),
        Seq(W("Emiten"), W("TLKM")))),
      merges = Seq(Seq("A1:C1", "A2:A3")))
    val cells = Xlsx.parseWorkbook(bytes)
      .map { case (_, _, r, c, v) => (r, c, v) }.toSet
    // covered positions carry the anchor value
    assert(cells(( 1L, 2L, "JUDUL LAPORAN")) && cells((1L, 3L, "JUDUL LAPORAN")))
    assert(cells((3L, 1L, "Periode")))
    // anchors unchanged, values intact
    assert(cells((2L, 1L, "Periode")) && cells((3L, 2L, "triwulan-1")))
    // the A4-style KV pivot over the filled cells pairs EVERY value row
    // with its key — the covered row no longer silently loses it
    val kv = Xlsx.parseWorkbook(bytes)
      .collect { case (_, _, r, c, v) if r >= 2 => (r, c, v) }
      .groupBy(_._1).toSeq
      .map { case (r, cs) =>
        (cs.find(_._2 == 1L).map(_._3).getOrElse(""),
         cs.find(_._2 == 2L).map(_._3).getOrElse(""))
      }.toSet
    assert(kv == Set(("Periode", "2024"), ("Periode", "triwulan-1"),
      ("Emiten", "TLKM")))
    // merged-region metadata surface
    val dir = java.nio.file.Files.createTempDirectory("xlsx-merge").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "m.xlsx"), bytes)
    val regions = Xlsx.mergedRegions(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(regions == Set(("Meta", 1L, 1L, 1L, 3L), ("Meta", 2L, 1L, 3L, 1L)))
    // a cell that exists inside a merged region is never overwritten:
    // craft a workbook where the covered cell carries its own value
    val clash = Xlsx.writeWorkbook(
      Seq("S" -> Seq(Seq(W("anchor"), W("own")))),
      merges = Seq(Seq("A1:B1")))
    val got = Xlsx.parseWorkbook(clash).map { case (_, _, r, c, v) => (r, c, v) }
    assert(got.contains((1L, 2L, "own")) && !got.contains((1L, 2L, "anchor")))
  }
}
