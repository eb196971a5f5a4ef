package graft

import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {

  test("decomposed sequences compose to NFC; already-NFC text is identity") {
    import spark.implicits._
    val df = Seq(
      ("cafe\u0301", "café"),          // e + combining acute -> é
      ("A\u030Angstro\u0308m", "Ångström"), // ring + diaeresis
      ("plain ascii", "plain ascii"),
      ("", "")
    ).toDF("raw", "expected")
      .withColumn("norm", NfcNormalize.nfcNormalize(col("raw")))
    assert(df.filter(col("norm") =!= col("expected")).count() == 0)
    // composition strictly shrinks character count for the combining pairs
    val shrunk = df.filter(col("raw") =!= col("expected"))
      .filter(length(col("norm")) >= length(col("raw")))
    assert(shrunk.count() == 0)
  }

  test("nfc_normalize is idempotent and null-propagating") {
    import spark.implicits._
    val df = Seq(Some("cafe\u0301"), Some("x"), None).toDF("raw")
      .withColumn("once", NfcNormalize.nfcNormalize(col("raw")))
      .withColumn("twice", NfcNormalize.nfcNormalize(col("once")))
    assert(df.filter(col("once") =!= col("twice")).count() == 0)
    assert(df.filter(col("raw").isNull && col("once").isNotNull).count() == 0)
  }

  test("nfc_normalize is callable from SQL and stays in codegen") {
    NfcNormalize.register(spark)
    // NOTE: Spark's chr() is ASCII-mod-256 (unlike DuckDB's code-point
    // chr), so the combining mark is embedded in the literal directly
    val r = spark.sql("SELECT nfc_normalize('café') AS n").head.getString(0)
    assert(r == "café")
    val df = graft.queries.TextOps.queries("t12_nfc_normalize")(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen stages materialize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)   // WholeStageCodegen span present
    assert(plan.contains("nfc_normalize"), plan)
  }
}
