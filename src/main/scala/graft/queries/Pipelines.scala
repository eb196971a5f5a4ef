package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plans.{CalkLine, CalkParser, FactPipeline, NotesEnrichment}

/** Reference end-to-end pipelines (E1/E2) surfaced as driver-visible
  * queries. The driver test tables model the post-extraction relational
  * world (FIXTURES.md §B is our own shape), so these run on inline
  * deterministic fixtures and carry no DuckDB oracle — the driver
  * records the weaker rows>0 check and `PipelineSpec` holds the golden
  * assertions (SURVEY.md §5 strategy item 4).
  */
object Pipelines extends QueryModule {

  /** B1/B2-shaped fixture: two filings — BBNI 2023 Q2 (scaled x1e6) and
    * TLKM 2023 Q4 (annual, unscaled, name missing the "PT " prefix);
    * one statement already loaded for BBNI (exercises the J2 gate). */
  def fixture(s: SparkSession): (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val meta = Seq(
      ("BBNI-2023-Q2", "Kode entitas", "BBNI"),
      ("BBNI-2023-Q2", "Nama entitas", "PT Bank Negara Indonesia (Persero) Tbk"),
      ("BBNI-2023-Q2", "Periode penyampaian laporan keuangan", "Kuartal II / Second Quarter"),
      ("BBNI-2023-Q2", "Tanggal awal periode berjalan", "2023-01-01"),
      ("BBNI-2023-Q2", "Mata uang", "IDR"), // noise key
      ("TLKM-2023-Q4", "Kode entitas", "TLKM"),
      ("TLKM-2023-Q4", "Nama entitas", "Telkom Indonesia Tbk"),
      ("TLKM-2023-Q4", "Periode penyampaian laporan keuangan", "Tahunan / Annual"),
      ("TLKM-2023-Q4", "Tanggal awal periode berjalan", "2023-01-01"),
    ).toDF("filing_id", "key", "value")
    val raw = Seq(
      // 3 junk header rows per sheet (row_id 0-2) — must be skipped
      ("BBNI-2023-Q2", "Laporan Neraca", 0, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("BBNI-2023-Q2", "Laporan Neraca", 1, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("BBNI-2023-Q2", "Laporan Neraca", 2, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("BBNI-2023-Q2", "Laporan Neraca", 3, "Jumlah aset", java.lang.Double.valueOf(1000.5)),
      ("BBNI-2023-Q2", "Laporan Neraca", 4, "Jumlah liabilitas", java.lang.Double.valueOf(400.25)),
      ("BBNI-2023-Q2", "Laporan Neraca", 5, null, java.lang.Double.valueOf(7.0)), // null item -> "-"
      ("BBNI-2023-Q2", "Laporan Laba Rugi", 0, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("BBNI-2023-Q2", "Laporan Laba Rugi", 1, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("BBNI-2023-Q2", "Laporan Laba Rugi", 2, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("BBNI-2023-Q2", "Laporan Laba Rugi", 3, "Laba bersih", java.lang.Double.valueOf(88.0)),
      ("TLKM-2023-Q4", "Laporan Neraca", 0, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("TLKM-2023-Q4", "Laporan Neraca", 1, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("TLKM-2023-Q4", "Laporan Neraca", 2, "HEADER", null.asInstanceOf[java.lang.Double]),
      ("TLKM-2023-Q4", "Laporan Neraca", 3, "Jumlah aset", java.lang.Double.valueOf(5e12)),
      ("TLKM-2023-Q4", "Laporan Neraca", 4, "Jumlah ekuitas", null.asInstanceOf[java.lang.Double]), // null value -> 0
    ).toDF("filing_id", "statement", "row_id", "item", "value")
    val existing = Seq(
      // BBNI 2023 Q2 income statement already loaded -> its rows must be gated out
      ("BBNI", 2023, 2, "Laporan Laba Rugi"),
    ).toDF("kode_emiten", "tahun", "quartal", "grup_laporan_keuangan")
    (raw, meta, existing)
  }

  /** B4-shaped CALK fixture exercising every parser rule: numeric
    * headings, ALL-CAPS continuation, valid letter sequence a,b,
    * out-of-sequence demotion (c after a), double letters after z is
    * skipped (kept small), empty-content repair, preamble drop. */
  def calkFixture(s: SparkSession): Seq[CalkLine] = Seq(
    CalkLine("doc1", 1, 0, "preamble line before any heading"),
    CalkLine("doc1", 1, 1, "1. UMUM"),
    CalkLine("doc1", 1, 2, "PENDIRIAN PERUSAHAAN"), // W5 continuation
    CalkLine("doc1", 1, 3, "Perusahaan didirikan pada tahun 1946."),
    CalkLine("doc1", 1, 4, "a. Pendirian"),
    CalkLine("doc1", 1, 5, "Didirikan berdasarkan akta notaris."),
    CalkLine("doc1", 1, 6, "c. Melompat"), // out of sequence -> content
    CalkLine("doc1", 1, 7, "b. Penawaran Umum"),
    CalkLine("doc1", 2, 0, "Saham dicatatkan di bursa."),
    CalkLine("doc1", 2, 1, "2. IKHTISAR KEBIJAKAN AKUNTANSI"),
    CalkLine("doc1", 2, 2, "a. Dasar Penyusunan"), // empty content -> W4 repair
    CalkLine("doc1", 2, 3, "b. Kas dan Setara Kas"),
    CalkLine("doc1", 2, 4, "Meliputi kas dan deposito jangka pendek."),
    CalkLine("doc2", 1, 0, "3. PERPAJAKAN"),
    CalkLine("doc2", 1, 1, "Beban pajak dihitung tahunan."),
  )

  private def p01(s: SparkSession, d: String): DataFrame = {
    val (raw, meta, existing) = fixture(s)
    FactPipeline.run(raw, meta, existing).orderBy("kode_emiten", "item")
  }

  private def p02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    CalkParser.parse(s.createDataset(calkFixture(s)))
      .toDF().orderBy("doc_id", "kode")
  }

  private def p03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fact = Seq(
      ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Kas dan setara kas", 100.0, null.asInstanceOf[String]),
      ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Jumlah aset", 900.0, null.asInstanceOf[String]),
    ).toDF("kode_emiten", "nama_emiten", "tahun", "quartal",
      "grup_laporan_keuangan", "item", "nilai", "notes")
    val lines = Seq(
      ("doc1", "BBNI", 2023, 2, "Laporan Neraca", 4, 0, "Kas dan setara"),
      ("doc1", "BBNI", 2023, 2, "Laporan Neraca", 4, 1, "2,3b"),
    ).toDF("doc_id", "kode_emiten", "tahun", "quartal",
      "grup_laporan_keuangan", "page", "line_no", "text")
    NotesEnrichment.enrich(fact, lines).orderBy("item", "notes")
  }

  val queries: Map[String, QueryFn] = Map(
    "p01_fact_pipeline" -> p01 _,
    "p02_calk_parser" -> p02 _,
    "p03_notes_enrichment" -> p03 _,
  )

  // Inline fixtures, not sfDir tables — no DuckDB oracle (rows>0 check).
  val oracle: Map[String, String] = Map.empty
}
