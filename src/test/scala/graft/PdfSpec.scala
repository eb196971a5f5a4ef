package graft

import graft.queries.Media
import graft.sources.Pdf

class PdfSpec extends SparkSpec {

  private def dir = Media.writePdfFixture("/tmp/graft-pdf-spec")

  test("parser round-trips the writer's PDFs line-for-line") {
    val got = Pdf.read(spark, dir).toDF()
      .orderBy("file", "page", "line_no")
      .collect().map(_.toSeq).toSeq
    val want = Media.pdfExpected(spark)
      .orderBy("file", "page", "line_no")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("escaped parentheses and backslashes survive the round trip") {
    val bytes = Pdf.writePdf(Seq(Seq("""a (b) \ c""", "plain")))
    assert(Pdf.parsePdf(bytes) ==
      Seq((1L, 0L, """a (b) \ c"""), (1L, 1L, "plain")))
  }

  test("page order follows /Kids, content is genuinely FlateDecode") {
    val bytes = Pdf.writePdf(Seq(Seq("p1"), Seq("p2"), Seq("p3")))
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(raw.contains("/Filter /FlateDecode"))
    assert(!raw.contains("p2) Tj")) // text not stored in clear
    assert(Pdf.parsePdf(bytes).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("positioned parser reports absolute coordinates for both writer shapes") {
    // absolute per-cell BT/Td blocks
    val pos = Pdf.writePdfPositioned(Seq(Seq((72, 700, "a"), (250, 700, "b (x)"))))
    assert(Pdf.parsePdfPositioned(pos) ==
      Seq((1L, 0L, 72.0, 700.0, "a"), (1L, 1L, 250.0, 700.0, "b (x)")))
    // relative line-walk shape: Td offsets accumulate within BT/ET
    val rel = Pdf.writePdf(Seq(Seq("l1", "l2", "l3")))
    assert(Pdf.parsePdfPositioned(rel).map(t => (t._3, t._4, t._5)) ==
      Seq((72.0, 720.0, "l1"), (72.0, 706.0, "l2"), (72.0, 692.0, "l3")))
  }

  test("tableRegion crops to the area and rebuilds the grid") {
    val d = Media.writePdfPosFixture("/tmp/graft-pdf-pos-spec")
    val rows = Pdf.tableRegion(spark, d, 60, 570, 400, 650).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6)))
    // nothing outside the crop area leaks in
    assert(!rows.exists(r => Set("LAPORAN POSISI KEUANGAN", "PT Contoh Tbk",
      "Lihat catatan terlampir", "di luar area", "margin-note", "Paragraf lain")(r._5)))
    // grid shape on the 2023 page-1 table: 4 rows x 3 cols
    val p1 = rows.filter(r => r._1 == "tbl_2023.pdf" && r._2 == 1L)
    assert(p1.map(r => (r._3, r._4, r._5)).toSeq == Seq(
      (1L, 1L, "Pos"), (1L, 2L, "2023"), (1L, 3L, "2022"),
      (2L, 1L, "Kas dan setara kas"), (2L, 2L, "1500.5"), (2L, 3L, "1200.25"),
      (3L, 1L, "Piutang usaha"), (3L, 2L, "800"), (3L, 3L, "650.75"),
      (4L, 1L, "Jumlah aset"), (4L, 2L, "2300.5"), (4L, 3L, "1851")))
    // escaped parens survive: page 2's (6500)
    assert(rows.exists(r => r._1 == "tbl_2023.pdf" && r._2 == 2L && r._5 == "(6500)"))
  }

  test("searchPages returns the first matching page per file only") {
    val rows = Pdf.searchPages(spark, dir, "laba").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("filing_2024.pdf", 1L)))
    val umum = Pdf.searchPages(spark, dir, "umum").collect()
    assert(umum.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("filing_2023.pdf", 2L)))
  }
}
