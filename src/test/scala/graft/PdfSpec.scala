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

  test("searchPages returns the first matching page per file only") {
    val rows = Pdf.searchPages(spark, dir, "laba").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("filing_2024.pdf", 1L)))
    val umum = Pdf.searchPages(spark, dir, "umum").collect()
    assert(umum.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("filing_2023.pdf", 2L)))
  }
}
