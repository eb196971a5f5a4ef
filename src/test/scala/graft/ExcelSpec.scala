package graft

import graft.sources.{Excel, Xls, Xlsx}

/** Generation-blind Excel dispatch (Excel.parseAny/read): the pandas
  * contract — files open by their BYTES, not their extension, so a
  * mislabeled workbook (OOXML renamed .xls, BIFF8 renamed .xlsx — both
  * endemic in filing archives) still reads through the right parser,
  * and a non-workbook fails loudly naming its leading bytes. */
class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private def ooxmlBytes: Array[Byte] =
    Xlsx.writeWorkbook(Seq(("Modern", Seq(
      Seq(Xlsx.W("judul"), Xlsx.W("nilai")),
      Seq(Xlsx.W("Kas"), Xlsx.W("1500.5", num = true))))))

  private def biffBytes: Array[Byte] = {
    import graft.sources.Xls._
    writeXls(Seq(XlsSheet("Legacy", Seq(
      (1, 1, XStr("judul")), (1, 2, XStr("nilai")),
      (2, 1, XStr("Kas")), (2, 2, XNum(1500.5))))))
  }

  test("parseAny dispatches on magic bytes, not extension") {
    val modern = Excel.parseAny(ooxmlBytes)
    assert(modern.map(_._1).distinct === Seq("Modern"))
    assert(modern.exists { case (_, _, r, c, v) => r == 2 && c == 2 && v == "1500.5" })
    val legacy = Excel.parseAny(biffBytes)
    assert(legacy.map(_._1).distinct === Seq("Legacy"))
    assert(legacy.exists { case (_, _, r, c, v) => r == 2 && c == 2 && v == "1500.5" })
    val e = intercept[IllegalArgumentException] {
      Excel.parseAny("plain,csv,bytes\n1,2,3\n".getBytes("US-ASCII"))
    }
    assert(e.getMessage.contains("neither a zip") &&
      e.getMessage.contains("70 6C 61 69"),
      s"must name the leading bytes: ${e.getMessage}")
  }

  test("read() opens mislabeled files through the right parser; discovery spans generations") {
    val dir = graft.util.Scratch.dir("excel_spec")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    // deliberately CROSSED extensions
    java.nio.file.Files.write(
      new java.io.File(dir, "modern_but_named.xls").toPath, ooxmlBytes)
    java.nio.file.Files.write(
      new java.io.File(dir, "legacy_but_named.xlsx").toPath, biffBytes)
    val cells = Excel.read(spark, dir)
    val bySheet = cells.collect().groupBy(_.sheet)
    assert(bySheet.keySet === Set("Modern", "Legacy"),
      s"both mislabeled files must parse: ${bySheet.keySet}")
    assert(bySheet("Modern").head.file === "modern_but_named.xls")
    assert(bySheet("Legacy").head.file === "legacy_but_named.xlsx")
    // value parity across generations: the same logical cell reads
    // identically whichever container carried it
    def cell(sheet: String, r: Long, c: Long): String =
      bySheet(sheet).find(x => x.row_idx == r && x.col_idx == c).get.value
    assert(cell("Modern", 2, 2) === cell("Legacy", 2, 2))
    // discovery walks both generations in one call
    val hit = Excel.discoverSheet(spark, dir, "kas")
      .as[(String, String, Long)].collect().head
    assert(hit._1 === "legacy_but_named.xlsx" || hit._1 === "modern_but_named.xls")
  }
}
