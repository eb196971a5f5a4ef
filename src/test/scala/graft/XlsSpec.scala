package graft

import graft.sources.{Xls, Xlsx}
import graft.sources.Xls._

/** Legacy .xls (BIFF8) connector: CFB container (FAT and MINI-stream
  * placements), BIFF8 records (SST with CONTINUE stitching, RK/MULRK,
  * FORMULA cached values, MERGEDCELLS), date XFs through the shared
  * serial rules, and loud failure on pre-BIFF8 files. The fixture
  * bytes come from the independent encoder (writeXls — shares no code
  * with the reader). */
class XlsSpec extends SparkSpec {
  import spark.implicits._

  private def cellsOf(bytes: Array[Byte]): Seq[(String, Long, Long, Long, String)] =
    Xls.parseWorkbook(bytes)

  test("decodeRk: all four encodings") {
    // int: v << 2 | 2
    assert(Xls.decodeRk((1500L << 2) | 2L) === 1500.0)
    assert(Xls.decodeRk(((-7L) << 2) & 0xFFFFFFFFL | 2L) === -7.0)
    // int / 100: v << 2 | 3
    assert(Xls.decodeRk((12345L << 2) | 3L) === 123.45)
    // float: high 32 bits of the double, low 30 bits zeroed
    val bits = java.lang.Double.doubleToLongBits(1500.5)
    assert(Xls.decodeRk((bits >>> 32) & 0xFFFFFFFCL) === 1500.5)
    assert(Xls.decodeRk(((bits >>> 32) & 0xFFFFFFFCL) | 1L) === 15.005)
  }

  test("small workbook rides the MINI stream and round-trips every record family") {
    val sheets = Seq(
      XlsSheet("Laporan",
        cells = Seq(
          (1, 1, XStr("Pos")), (1, 2, XStr("Nilai")),
          (2, 1, XStr("Kas")), (2, 2, XNum(1500.5)),
          (3, 1, XStr("Piutang")), (3, 2, XInt(800)),
          (4, 1, XStr("Tanggal")), (4, 2, XDate("2024-03-31")),
          (5, 1, XStr("Audit")), (5, 2, XBool(true)),
          (6, 1, XStr("Total")), (6, 2, XFormulaNum(2300.5)),
          (7, 1, XStr("Catatan")), (7, 2, XFormulaStr("lihat CALK 3")),
          // an RK run: three consecutive ints → one MULRK record
          (8, 1, XInt(10)), (8, 2, XInt(20)), (8, 3, XInt(30)),
          (9, 1, XStr("MERGED"))), // the merge anchor
        merges = Seq((9, 1, 10, 2))), // fills (9,1)..(10,2)
      XlsSheet("Ikhtisar", cells = Seq((1, 1, XStr("ringkasan")))))
    val bytes = writeXls(sheets)
    assert(bytes.length >= 512)
    // the workbook stream is under the mini cutoff → mini-stream path
    val streams = Xls.cfbStreams(bytes)
    assert(streams("Workbook").length < 4096)
    val got = cellsOf(bytes)
    val bySheet = got.groupBy(_._1)
    assert(bySheet.keySet === Set("Laporan", "Ikhtisar"))
    val lap = bySheet("Laporan").map { case (_, _, r, c, v) => (r, c, v) }.toSet
    assert(lap.contains((2L, 2L, "1500.5")))
    assert(lap.contains((3L, 2L, "800")))
    assert(lap.contains((4L, 2L, "2024-03-31")))
    assert(lap.contains((5L, 2L, "TRUE")))
    assert(lap.contains((6L, 2L, "2300.5")))
    assert(lap.contains((7L, 2L, "lihat CALK 3")))
    assert(lap.contains((8L, 1L, "10")) && lap.contains((8L, 2L, "20")) &&
      lap.contains((8L, 3L, "30")), "MULRK run must explode to cells")
    // merged region anchor-fills all four covered positions
    Seq((9L, 1L), (9L, 2L), (10L, 1L), (10L, 2L)).foreach { case (r, c) =>
      assert(lap.contains((r, c, "MERGED")), s"merge fill at ($r, $c)")
    }
    // declared order: Laporan is sheet 1, Ikhtisar 2
    assert(got.filter(_._1 == "Laporan").forall(_._2 == 1L))
    assert(got.filter(_._1 == "Ikhtisar").forall(_._2 == 2L))
  }

  test("large workbook rides regular FAT sectors; SST splits into CONTINUE mid-string") {
    val many = (1 to 120).map(i => (i, 1, XStr(f"baris panjang nomor $i%03d")))
    val sheets = Seq(XlsSheet("Data",
      cells = many :+ ((121, 1, XStr("kalimat-terakhir-yang-dibelah")))))
    val bytes = writeXls(sheets, splitSst = true, padTo = 5000)
    val streams = Xls.cfbStreams(bytes)
    assert(streams("Workbook").length >= 4096, "fixture must exceed the mini cutoff")
    val got = cellsOf(bytes).map { case (_, _, r, c, v) => (r, c, v) }.toSet
    assert(got.size === 121)
    assert(got.contains((121L, 1L, "kalimat-terakhir-yang-dibelah")),
      "the CONTINUE-split string must reassemble exactly")
    assert(got.contains((1L, 1L, "baris panjang nomor 001")))
  }

  test("SST boundary EXACTLY after a string header: continuation flags byte re-read") {
    // the record break falls between the last string's header and its
    // first character — zero chars consumed when the CONTINUE starts.
    // The fixture's continuation flips to WIDE chars, so consuming the
    // flags byte as character data garbles the string unmissably.
    val sheets = Seq(XlsSheet("Data", cells = Seq(
      (1, 1, XStr("pertama")), (2, 1, XStr("header-split")))))
    val bytes = writeXls(sheets, splitSstAtHeader = true)
    val got = cellsOf(bytes).map { case (_, _, r, c, v) => (r, c, v) }.toSet
    assert(got === Set((1L, 1L, "pertama"), (2L, 1L, "header-split")))
  }

  test("LABELSST index out of SST range fails loudly, not as plausible data") {
    val bytes = writeXls(Seq(XlsSheet("S", Seq((1, 1, XStr("x"))))),
      sstIndexBump = 5)
    val e = intercept[IllegalArgumentException] { Xls.parseWorkbook(bytes) }
    assert(e.getMessage.contains("corrupt XLS"))
    assert(e.getMessage.contains("LABELSST") && e.getMessage.contains("5"))
  }

  test("wide (UTF-16) strings and sheet names; 1904 date system") {
    val sheets = Seq(XlsSheet("Ringkasan–ü",
      cells = Seq((1, 1, XStr("naïve — résumé ±µ")), (2, 1, XDate("2024-03-31")))))
    val bytes = writeXls(sheets, date1904 = true)
    val got = cellsOf(bytes)
    assert(got.head._1 === "Ringkasan–ü")
    assert(got.map(t => (t._3, t._4, t._5)).toSet ===
      Set((1L, 1L, "naïve — résumé ±µ"), (2L, 1L, "2024-03-31")))
  }

  test("pre-BIFF8 and non-CFB files fail loudly with the real reason") {
    val e1 = intercept[IllegalArgumentException] {
      Xls.parseWorkbook("not a compound file at all".getBytes("US-ASCII"))
    }
    assert(e1.getMessage.contains("magic"))
    // rename the stream to the BIFF5/7 'Book' name: loud, by name
    val ok = writeXls(Seq(XlsSheet("S", Seq((1, 1, XStr("x"))))))
    val book = Xls.cfbStreams(ok)("Workbook")
    val e2 = intercept[IllegalArgumentException] {
      Xls.parseWorkbook(Xls.cfbWrap("Book", book))
    }
    assert(e2.getMessage.contains("BIFF5/7"))
    // BIFF8 container with a pre-BIFF8 version stamp in BOF
    val old = book.clone()
    old(4) = 0x00; old(5) = 0x05 // version 0x0500
    val e3 = intercept[IllegalArgumentException] {
      Xls.parseWorkbook(Xls.cfbWrap("Workbook", old))
    }
    assert(e3.getMessage.toLowerCase.contains("biff"))
  }

  test("Spark surface: read() and discoverSheet() mirror the Xlsx shape") {
    val dir = graft.util.Scratch.dir("xls_spec")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "a.xls").toPath,
      writeXls(Seq(XlsSheet("Cover", Seq((1, 1, XStr("pengantar")))),
        XlsSheet("NERACA", Seq((1, 1, XStr("NERACA KONSOLIDASIAN")),
          (2, 1, XStr("Jumlah aset")), (2, 2, XInt(2300)))))))
    java.nio.file.Files.write(new java.io.File(dir, "b.xls").toPath,
      writeXls(Seq(XlsSheet("Lain", Seq((1, 1, XStr("NERACA juga")))))))
    val cells = Xls.read(spark, dir)
    assert(cells.count() === 5L)
    // same Cell schema as Xlsx — operators are format-blind
    assert(cells.toDF().columns.toSeq ===
      Seq("file", "sheet", "sheet_idx", "row_idx", "col_idx", "value"))
    val hit = Xls.discoverSheet(spark, dir, "neraca")
      .as[(String, String, Long)].collect().head
    assert(hit === (("a.xls", "NERACA", 1L)))
  }
}
