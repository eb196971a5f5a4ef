package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("every text query runs; oracle SQL exists for each") {
    TextOps.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).columns.nonEmpty, name)
    }
    assert(TextOps.queries.keySet == TextOps.oracle.keySet)
  }

  test("t01 cleaning round-trips every document") {
    val df = TextOps.queries("t01_clean_roundtrip")(spark, sfDir)
    assert(df.filter(!col("roundtrip_ok")).count() == 0)
  }

  test("t06 segmentation is total: token counts add back up per doc") {
    val segs = TextOps.queries("t06_segmentation")(spark, sfDir)
      .groupBy("doc_id").agg(sum("n_words").as("n"))
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("want"))
    val bad = segs.join(docs, "doc_id").filter(col("n") =!= col("want"))
    assert(bad.count() == 0)
  }

  test("t07 repair leaves no empty bodies") {
    val df = TextOps.queries("t07_content_repair")(spark, sfDir)
    assert(df.filter(col("repaired").isNull || col("repaired") === "").count() == 0)
  }

  test("map-only queries have no shuffle; segmentation shuffles on doc_id once") {
    val clean = planOf(TextOps.queries("t01_clean_roundtrip")(spark, sfDir))
    // t01 sorts for output determinism; no hash shuffle before it
    assert(!clean.contains("Exchange hashpartitioning"), clean)
    val seg = planOf(TextOps.queries("t06_segmentation")(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(seg).size
    assert(exchanges <= 2, s"window + groupBy should reuse doc_id partitioning:\n$seg")
  }

  test("t11 packing conserves tokens and packs each language from bin 0") {
    import org.apache.spark.sql.functions.{col, min, sum, regexp_extract_all, size, lit}
    val df = TextOps.queries("t11_sequence_packing")(spark, sfDir)
    val packed = df.agg(sum(col("sum_tokens"))).head.getLong(0)
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .select(sum(size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).cast("long")))
      .head.getLong(0)
    assert(packed == corpus, "every token lands in exactly one sequence bin")
    val firstBins = df.groupBy(col("lang")).agg(min(col("seq_id")).as("m"))
    assert(firstBins.filter(col("m") =!= 0L).count() == 0,
      "each language's packing starts at bin 0")
  }

  test("t09 redaction removes every planted PII token") {
    import org.apache.spark.sql.functions.col
    val df = TextOps.queries("t09_pii_redaction")(spark, sfDir)
    assert(df.filter(!col("clean")).count() == 0, "residual PII after redaction")
    assert(df.filter(col("n_emails") < 1 || col("n_phones") < 1 || col("n_ips") < 1)
      .count() == 0, "every doc has the planted email/phone/ip")
    assert(df.filter(col("redacted").contains("<EMAIL>") &&
      col("redacted").contains("<PHONE>") && col("redacted").contains("<IP>"))
      .count() == df.count())
  }
}
