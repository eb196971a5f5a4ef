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
}
