package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plans.{CalkLine, CalkParser, FactPipeline, NotesEnrichment}

/** Reference end-to-end pipelines (E1/E2) surfaced as driver-visible
  * queries. The driver test tables model the post-extraction relational
  * world (FIXTURES.md §B is our own shape), so these run on inline
  * deterministic fixtures — which graft.Verify also dumps to parquet so
  * the DuckDB oracles below recompute the full pipelines from the same
  * inputs (hash-checked, not just rows>0). `PipelineSpec` additionally
  * holds the golden assertions (SURVEY.md §5 strategy item 4).
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
    * headings with the ALL-CAPS/single-dot guard (non-caps and
    * multi-dot "<n>." lines silently dropped), ALL-CAPS continuation,
    * valid letter sequence a,b, out-of-sequence demotion (c after a),
    * repeated-letter close + orphan content re-attach, double letter
    * without 'z' demoted, empty-content repair, preamble drop. */
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
    CalkLine("doc3", 1, 0, "1. UMUM"),
    CalkLine("doc3", 1, 1, "Isi umum."),
    CalkLine("doc3", 1, 2, "2. Ikhtisar"),         // title not ALL-CAPS -> dropped
    CalkLine("doc3", 1, 3, "3. IKHTISAR NO. DUA"), // two dots -> dropped
    CalkLine("doc3", 1, 4, "a. Pendirian"),
    CalkLine("doc3", 1, 5, "Isi pendirian."),
    CalkLine("doc3", 1, 6, "a. Pendirian Ulang"),  // repeated letter -> close, no new section
    CalkLine("doc3", 1, 7, "Baris yatim."),        // orphan content -> last emitted section
    CalkLine("doc3", 1, 8, "ab. Ganda"),           // double letter, no 'z' seen -> content path
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

  /** E2-shaped fixture for notes enrichment: two fact rows, one matched
    * by containment with a "2,3b" multi-reference on the next line. */
  def p03Fixture(s: SparkSession): (DataFrame, DataFrame) = {
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
    (fact, lines)
  }

  private def p03(s: SparkSession, d: String): DataFrame = {
    val (fact, lines) = p03Fixture(s)
    NotesEnrichment.enrich(fact, lines).orderBy("item", "notes")
  }

  val queries: Map[String, QueryFn] = Map(
    "p01_fact_pipeline" -> p01 _,
    "p02_calk_parser" -> p02 _,
    "p03_notes_enrichment" -> p03 _,
  )

  /** These oracles run over the fixture parquet that graft.Verify dumps
    * under `<outDir>/fixtures` — the `__FIXTURES__` token is replaced
    * with that absolute path at dump time, so DuckDB recomputes the
    * whole pipeline from the same inputs Spark read. p02's parser is
    * not SQL-expressible; its oracle is the hand-traced golden VALUES
    * (independently pinned semantics — PipelineSpec asserts the same
    * rows from first principles). */
  private val p01Sql =
    """WITH meta AS (SELECT * FROM read_parquet('__FIXTURES__/p01_meta/*.parquet')),
       raw AS (SELECT * FROM read_parquet('__FIXTURES__/p01_raw/*.parquet')),
       existing AS (SELECT * FROM read_parquet('__FIXTURES__/p01_existing/*.parquet')),
       mw AS (
         SELECT filing_id,
           max(CASE WHEN key = 'Kode entitas' THEN value END) AS kode_emiten,
           max(CASE WHEN key = 'Nama entitas' THEN value END) AS raw_nama,
           max(CASE WHEN key = 'Periode penyampaian laporan keuangan' THEN value END) AS periode,
           max(CASE WHEN key = 'Tanggal awal periode berjalan' THEN value END) AS tanggal_awal
         FROM meta GROUP BY filing_id),
       mw2 AS (
         SELECT filing_id, kode_emiten,
           CASE WHEN upper(substr(raw_nama, 1, 2)) = 'PT' THEN raw_nama
                ELSE 'PT ' || raw_nama END AS nama_emiten,
           CAST(substr(tanggal_awal, 1, 4) AS INT) AS tahun,
           CASE WHEN periode LIKE '%Kuartal III%' THEN 3
                WHEN periode LIKE '%Kuartal II%' THEN 2
                WHEN periode LIKE '%Kuartal I%' THEN 1
                ELSE 4 END AS quartal
         FROM mw),
       cleaned AS (
         SELECT filing_id, statement, coalesce(item, '-') AS item,
           coalesce(value, 0.0) AS value
         FROM raw WHERE row_id >= 3),
       attached AS (
         SELECT m.kode_emiten, m.nama_emiten, m.tahun, m.quartal,
           c.statement AS grup_laporan_keuangan, c.item,
           CASE WHEN m.quartal <> 4 THEN c.value * 1e6 ELSE c.value END AS nilai
         FROM cleaned c JOIN mw2 m USING (filing_id))
       SELECT * FROM attached a
       WHERE NOT EXISTS (
         SELECT 1 FROM existing e
         WHERE e.kode_emiten = a.kode_emiten AND e.tahun = a.tahun
           AND e.quartal = a.quartal
           AND e.grup_laporan_keuangan = a.grup_laporan_keuangan)
       ORDER BY kode_emiten, item"""

  private val p02Sql =
    """SELECT * FROM (VALUES
         ('doc1', '1', 'UMUM PENDIRIAN PERUSAHAAN', 'Perusahaan didirikan pada tahun 1946.'),
         ('doc1', '1a', 'Pendirian', 'Didirikan berdasarkan akta notaris. c. Melompat'),
         ('doc1', '1b', 'Penawaran Umum', 'Saham dicatatkan di bursa.'),
         ('doc1', '2', 'IKHTISAR KEBIJAKAN AKUNTANSI', 'Saham dicatatkan di bursa.'),
         ('doc1', '2a', 'Dasar Penyusunan', 'Meliputi kas dan deposito jangka pendek.'),
         ('doc1', '2b', 'Kas dan Setara Kas', 'Meliputi kas dan deposito jangka pendek.'),
         ('doc2', '3', 'PERPAJAKAN', 'Beban pajak dihitung tahunan.'),
         ('doc3', '1', 'UMUM', 'Isi umum.'),
         ('doc3', '1a', 'Pendirian', 'Isi pendirian. Baris yatim. ab. Ganda')
       ) AS t(doc_id, kode, heading, content)
       ORDER BY doc_id, kode"""

  private val p03Sql =
    """WITH fact AS (
         SELECT *, row_number() OVER (
           PARTITION BY kode_emiten, tahun, quartal, grup_laporan_keuangan, item) AS _dup
         FROM read_parquet('__FIXTURES__/p03_fact/*.parquet')),
       lines AS (SELECT * FROM read_parquet('__FIXTURES__/p03_lines/*.parquet')),
       withnote AS (
         SELECT kode_emiten, tahun, quartal, grup_laporan_keuangan, text, note_ref
         FROM (
           SELECT *, CASE
               WHEN regexp_matches(n1, '^(\d{1,2}|(\d{1,2}[a-z])|(\d{1,2}(?:,\d{1,2}[a-z]?)*))$') THEN n1
               WHEN regexp_matches(n2, '^(\d{1,2}|(\d{1,2}[a-z])|(\d{1,2}(?:,\d{1,2}[a-z]?)*))$') THEN n2
             END AS note_ref
           FROM (
             SELECT *, lead(text, 1) OVER w AS n1, lead(text, 2) OVER w AS n2
             FROM lines
             WINDOW w AS (PARTITION BY doc_id, grup_laporan_keuangan
                          ORDER BY page, line_no)))
         WHERE note_ref IS NOT NULL),
       matched AS (
         SELECT f.kode_emiten, f.nama_emiten, f.tahun, f.quartal,
           f.grup_laporan_keuangan, f.item, f.nilai, f._dup,
           min(struct_pack(t := w.text, r := w.note_ref)).r AS note_ref
         FROM fact f JOIN withnote w
           ON f.kode_emiten = w.kode_emiten AND f.tahun = w.tahun
           AND f.quartal = w.quartal
           AND f.grup_laporan_keuangan = w.grup_laporan_keuangan
           AND contains(lower(f.item), lower(w.text))
         GROUP BY f.kode_emiten, f.nama_emiten, f.tahun, f.quartal,
           f.grup_laporan_keuangan, f.item, f.nilai, f._dup),
       exploded AS (
         SELECT m.*, i - 1 AS tok_pos, string_split(m.note_ref, ',')[i] AS tok
         FROM matched m,
           unnest(generate_series(1, len(string_split(m.note_ref, ',')))) AS t(i)),
       updated AS (
         SELECT kode_emiten, nama_emiten, tahun, quartal, grup_laporan_keuangan,
           item, nilai, tok AS notes, _dup
         FROM exploded WHERE tok_pos = 0),
       inserted AS (
         SELECT kode_emiten, nama_emiten, tahun, quartal, grup_laporan_keuangan,
           item, 0.0 AS nilai, tok AS notes
         FROM exploded WHERE tok_pos > 0),
       untouched AS (
         SELECT f.kode_emiten, f.nama_emiten, f.tahun, f.quartal,
           f.grup_laporan_keuangan, f.item, f.nilai, f.notes
         FROM fact f
         WHERE NOT EXISTS (
           SELECT 1 FROM updated u
           WHERE u.kode_emiten = f.kode_emiten AND u.tahun = f.tahun
             AND u.quartal = f.quartal
             AND u.grup_laporan_keuangan = f.grup_laporan_keuangan
             AND u.item = f.item AND u._dup = f._dup))
       SELECT * FROM (
         SELECT * FROM untouched
         UNION ALL SELECT kode_emiten, nama_emiten, tahun, quartal,
           grup_laporan_keuangan, item, nilai, notes FROM updated
         UNION ALL SELECT * FROM inserted)
       ORDER BY item, notes NULLS FIRST"""

  val oracle: Map[String, String] = Map(
    "p01_fact_pipeline" -> p01Sql,
    "p02_calk_parser" -> p02Sql,
    "p03_notes_enrichment" -> p03Sql,
  )
}
