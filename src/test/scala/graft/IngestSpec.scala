package graft

import org.apache.spark.sql.functions._

/** Pins the PERMISSIVE-parse quarantine behavior that the m14 oracle
  * cannot check: DuckDB's ignore_errors DROPS malformed rows, so which
  * raw lines land in the corrupt-record column — and that nothing else
  * does — is asserted here against the fixture definition itself.
  */
class IngestSpec extends SparkSpec {

  test("m14 PERMISSIVE parse quarantines exactly the malformed lines") {
    import spark.implicits._
    val parsed = graft.queries.Media.readCsvPermissive(spark).cache()
    try {
      val bad = parsed.filter($"_corrupt_record".isNotNull)
        .select($"_corrupt_record").as[String].collect().sorted
      // non-numeric key, short row, over-long row — verbatim raw lines
      assert(bad.toSeq == Seq("5,2.75", "6,4.0,gamma,extra", "oops,2.0,badid"),
        s"quarantined lines: ${bad.mkString(" | ")}")

      val good = parsed.filter($"_corrupt_record".isNull)
      assert(good.count() == 7)
      // the doubled-quote escape resolves to an embedded quote, and the
      // quoted comma does not split the field
      val notes = good.select($"id", $"note").as[(Long, String)]
        .collect().toMap
      assert(notes(3L) == "hello, world")
      assert(notes(4L) == "say \"hi\"")
      assert(notes(9L) == "unicode ✓")
      // empty numeric field -> null, not 0 and not corrupt
      assert(good.filter($"id" === 2L && $"amount".isNull).count() == 1)
    } finally parsed.unpersist()
  }
}
