package graft

import graft.plans.{CalkLine, CalkParser, CalkRow, FactPipeline}
import graft.queries.Pipelines
import org.apache.spark.sql.functions._

/** Golden-output tests for the E1/E2 pipelines (SURVEY.md §5: the
  * reference has no tests; its implicit invariants become these). */
class PipelineSpec extends SparkSpec {

  test("E1 golden: metadata pivot applies PT-prefix, year and quarter rules") {
    val (_, meta, _) = Pipelines.fixture(spark)
    val wide = FactPipeline.metadataPivot(meta).collect()
      .map(r => r.getString(0) -> r).toMap
    val bbni = wide("BBNI-2023-Q2")
    assert(bbni.getString(1) == "BBNI")
    assert(bbni.getString(2) == "PT Bank Negara Indonesia (Persero) Tbk")
    assert(bbni.getInt(3) == 2023 && bbni.getInt(4) == 2)
    val tlkm = wide("TLKM-2023-Q4")
    assert(tlkm.getString(2) == "PT Telkom Indonesia Tbk", "missing PT prefix must be added")
    assert(tlkm.getInt(4) == 4, "no Kuartal keyword -> annual (Q4)")
  }

  test("E1 golden: scaling, sentinel fill, header skip, idempotence gate") {
    val out = Pipelines.queries("p01_fact_pipeline")(spark, sfDir)
    val rows = out.collect()
    // gated: BBNI Laba Rugi was already loaded -> only Neraca rows remain for BBNI
    assert(!rows.exists(r => r.getString(4) == "Laporan Laba Rugi" && r.getString(0) == "BBNI"))
    // header rows skipped everywhere
    assert(!rows.exists(_.getString(5) == "HEADER"))
    // Q2 filing scaled x1e6
    val aset = rows.find(r => r.getString(0) == "BBNI" && r.getString(5) == "Jumlah aset").get
    assert(aset.getDouble(6) == 1000.5e6)
    // Q4 filing NOT scaled
    val tAset = rows.find(r => r.getString(0) == "TLKM" && r.getString(5) == "Jumlah aset").get
    assert(tAset.getDouble(6) == 5e12)
    // null item -> "-" sentinel, null value -> 0.0
    assert(rows.exists(r => r.getString(5) == "-" && r.getDouble(6) == 7.0e6))
    assert(rows.exists(r => r.getString(5) == "Jumlah ekuitas" && r.getDouble(6) == 0.0))
  }

  test("E1 property: loading the pipeline output again yields zero new rows") {
    val (raw, meta, _) = Pipelines.fixture(spark)
    val first = FactPipeline.run(raw, meta,
      spark.emptyDataFrame.select(lit("x").as("kode_emiten"), lit(0).as("tahun"),
        lit(0).as("quartal"), lit("x").as("grup_laporan_keuangan")).limit(0))
    val second = FactPipeline.run(raw, meta, first)
    assert(second.count() == 0, "idempotent load: second pass is a no-op")
  }

  test("E2 golden: CALK parser exact semantics") {
    import spark.implicits._
    val got = CalkParser.parse(spark.createDataset(Pipelines.calkFixture(spark)))
      .collect().map(r => (r.doc_id, r.kode) -> r).toMap
    // W5: ALL-CAPS continuation extends the numeric heading
    assert(got(("doc1", "1")).heading == "UMUM PENDIRIAN PERUSAHAAN")
    assert(got(("doc1", "1")).content == "Perusahaan didirikan pada tahun 1946.")
    // valid letter sequence: 1a then (after the demoted 'c.') 1b
    assert(got(("doc1", "1a")).content startsWith "Didirikan berdasarkan akta notaris.")
    // out-of-sequence 'c. Melompat' demotes to 1a's content
    assert(got(("doc1", "1a")).content.contains("c. Melompat"))
    assert(!got.contains(("doc1", "1c")))
    // 1b spans the page break
    assert(got(("doc1", "1b")).content == "Saham dicatatkan di bursa.")
    // W4 repair: empty 2a borrows from 2b
    assert(got(("doc1", "2a")).content == "Meliputi kas dan deposito jangka pendek.")
    // second document parsed independently
    assert(got(("doc2", "3")).content == "Beban pajak dihitung tahunan.")
    // preamble before any heading is dropped: kode set is exactly these
    assert(got.keySet == Set(("doc1", "1"), ("doc1", "1a"), ("doc1", "1b"),
      ("doc1", "2"), ("doc1", "2a"), ("doc1", "2b"), ("doc2", "3"),
      ("doc3", "1"), ("doc3", "1a")))
    // numeric guard (mainTesting.py:544): non-ALL-CAPS and multi-dot
    // "<n>." lines open nothing AND leave no content trace
    assert(!got.contains(("doc3", "2")) && !got.contains(("doc3", "3")))
    assert(!got.values.exists(_.content.contains("Ikhtisar")))
    // repeated letter heading closes the section; the orphan line and
    // the invalid double letter re-attach to the last emitted section
    assert(got(("doc3", "1a")).content ==
      "Isi pendirian. Baris yatim. ab. Ganda")
    assert(got(("doc3", "1")).content == "Isi umum.")
  }

  test("E2 fidelity: a section's FIRST letter heading is accepted whatever its letter") {
    import spark.implicits._
    val lines = Seq(
      CalkLine("d", 1, 0, "5. MODAL SAHAM"),
      CalkLine("d", 1, 1, "b. Seri B"), // first letter heading is 'b' — reference accepts it
      CalkLine("d", 1, 2, "Nilai nominal Rp 500."),
      CalkLine("d", 1, 3, "c. Seri C"), // consecutive from 'b' — accepted
      CalkLine("d", 1, 4, "Nilai nominal Rp 250."),
      CalkLine("d", 1, 5, "e. Melompat"), // gap — demotes to content
    )
    val got = CalkParser.parse(spark.createDataset(lines)).collect()
      .map(r => r.kode -> r.content).toMap
    assert(got.keySet == Set("5", "5b", "5c"))
    assert(got("5c").contains("e. Melompat"))
  }

  test("E2 property: parser is total — every section kode is unique per doc") {
    import spark.implicits._
    val out = CalkParser.parse(spark.createDataset(Pipelines.calkFixture(spark)))
    val dupes = out.groupBy("doc_id", "kode").count().filter(col("count") > 1)
    assert(dupes.count() == 0)
  }

  test("E2 scale shape: parse of many docs distributes (one partition per hash bucket)") {
    import spark.implicits._
    val many = (1 to 200).flatMap(i => Seq(
      CalkLine(s"doc$i", 1, 0, "1. UMUM"),
      CalkLine(s"doc$i", 1, 1, s"Konten dokumen $i.")))
    val out = CalkParser.parse(spark.createDataset(many))
    assert(out.count() == 200)
    // AQE may coalesce tiny test shuffles; the plan must still hash-
    // distribute by doc_id so real corpora spread across executors
    val logical = out.queryExecution.analyzed.toString
    assert(logical.contains("RepartitionByExpression [doc_id"), logical)
  }
}
