package graft

import graft.plans.NotesEnrichment
import org.apache.spark.sql.functions._

class NotesEnrichmentSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    val fact = Seq(
      ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Kas dan setara kas", 100.0, null.asInstanceOf[String]),
      ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Jumlah aset", 900.0, null.asInstanceOf[String]),
      ("BBNI", "PT BNI", 2023, 2, "Laporan Laba Rugi", "Laba bersih", 50.0, null.asInstanceOf[String]),
      ("TLKM", "PT Telkom", 2023, 2, "Laporan Neraca", "Kas dan setara kas", 7.0, null.asInstanceOf[String]),
    ).toDF("kode_emiten", "nama_emiten", "tahun", "quartal",
      "grup_laporan_keuangan", "item", "nilai", "notes")
    val lines = Seq(
      // line matches "Kas dan setara kas" by containment; next line is a multi-ref
      ("doc1", "BBNI", 2023, 2, "Laporan Neraca", 4, 0, "Kas dan setara"),
      ("doc1", "BBNI", 2023, 2, "Laporan Neraca", 4, 1, "2,3b"),
      // matches "Laba bersih"; ref is two lines ahead (lookahead-2)
      ("doc1", "BBNI", 2023, 2, "Laporan Laba Rugi", 9, 0, "Laba bersih"),
      ("doc1", "BBNI", 2023, 2, "Laporan Laba Rugi", 9, 1, "lihat catatan"),
      ("doc1", "BBNI", 2023, 2, "Laporan Laba Rugi", 9, 2, "14a"),
      // no fact row for this issuer+key -> no effect
      ("doc2", "UNVR", 2023, 2, "Laporan Neraca", 2, 0, "Kas dan setara"),
      ("doc2", "UNVR", 2023, 2, "Laporan Neraca", 2, 1, "9"),
    ).toDF("doc_id", "kode_emiten", "tahun", "quartal",
      "grup_laporan_keuangan", "page", "line_no", "text")
    (fact, lines)
  }

  test("golden: update + explode-insert + untouched rows") {
    val (fact, lines) = fixture()
    val out = NotesEnrichment.enrich(fact, lines).collect()
      .map(r => (r.getString(0), r.getString(5), r.getString(7), r.getDouble(6))).toSet
    assert(out == Set(
      ("BBNI", "Kas dan setara kas", "2", 100.0),   // token 0 updates
      ("BBNI", "Kas dan setara kas", "3b", 0.0),    // token 1 inserts zero-value row
      ("BBNI", "Laba bersih", "14a", 50.0),         // lookahead-2 hit
      ("BBNI", "Jumlah aset", null, 900.0),         // untouched
      ("TLKM", "Kas dan setara kas", null, 7.0),    // other issuer untouched
    ))
  }

  test("note pattern accepts reference shapes and rejects noise") {
    import spark.implicits._
    val ok = Seq("2", "14", "2a", "2,3b", "1,2,3", "10,11a")
    val bad = Seq("", "abc", "2x3", "123", "2,3b,", "lihat catatan", "a2")
    val df = (ok.map((_, true)) ++ bad.map((_, false))).toDF("s", "want")
    val got = df.withColumn("is", col("s").rlike(NotesEnrichment.notePattern))
    assert(got.filter(col("is") =!= col("want")).count() == 0)
  }

  test("identical fact rows keep their cardinality and each gets the note") {
    import spark.implicits._
    val fact = Seq(
      ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Kas dan setara kas", 100.0, null.asInstanceOf[String]),
      ("BBNI", "PT BNI", 2023, 2, "Laporan Neraca", "Kas dan setara kas", 100.0, null.asInstanceOf[String]),
    ).toDF("kode_emiten", "nama_emiten", "tahun", "quartal",
      "grup_laporan_keuangan", "item", "nilai", "notes")
    val lines = Seq(
      ("doc1", "BBNI", 2023, 2, "Laporan Neraca", 4, 0, "Kas dan setara"),
      ("doc1", "BBNI", 2023, 2, "Laporan Neraca", 4, 1, "7"),
    ).toDF("doc_id", "kode_emiten", "tahun", "quartal",
      "grup_laporan_keuangan", "page", "line_no", "text")
    val out = NotesEnrichment.enrich(fact, lines)
    assert(out.count() == 2, "a double-loaded row must not collapse")
    assert(out.filter(col("notes") === "7").count() == 2, "UPDATE touches every matching row")
  }

  test("enrichment is row-conserving modulo inserts") {
    val (fact, lines) = fixture()
    val out = NotesEnrichment.enrich(fact, lines)
    val inserts = out.filter(col("nilai") === 0.0 && col("notes").isNotNull).count()
    assert(out.count() == fact.count() + inserts)
  }

  test("plan: equi-keys drive a hash join; containment is a residual, not a nested loop") {
    val (fact, lines) = fixture()
    val plan = planOf(NotesEnrichment.enrich(fact, lines))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
