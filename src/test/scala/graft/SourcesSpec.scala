package graft

import graft.sources.{Sources, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private val tmp = "/tmp/graft-sources-spec"

  test("csv round-trip preserves values under an explicit schema") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), round(col("o_totalprice"), 2).as("price"))
    Sources.writeCsv(orders, s"$tmp/orders_csv")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("price", DoubleType)))
    val back = Sources.csv(spark, s"$tmp/orders_csv", schema)
    assert(back.schema == schema)
    assert(back.exceptAll(orders).count() == 0 && orders.exceptAll(back).count() == 0)
  }

  test("json-lines round-trip preserves nested struct values") {
    import spark.implicits._
    val df = Seq((1L, ("a", 2.5)), (2L, ("b", -1.0)))
      .toDF("id", "payload")
    Sources.writeJsonLines(df, s"$tmp/nested_json")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StructType(Seq(
        StructField("_1", StringType), StructField("_2", DoubleType))))))
    val back = Sources.jsonLines(spark, s"$tmp/nested_json", schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("partitioned write prunes directories on read (PartitionFilters)") {
    val orders = Tables.orders(spark, sfDir)
      .withColumn("yr", year(col("o_orderdate")))
    Sources.writePartitioned(orders, s"$tmp/orders_by_year", Seq("yr"))
    val read = spark.read.parquet(s"$tmp/orders_by_year").filter(col("yr") === 1997)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan)
    // pruned read returns exactly the 1997 slice
    assert(read.count() == orders.filter(col("yr") === 1997).count())
  }

  test("FAILFAST csv read rejects schema drift loudly") {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("missing_col", TimestampType),
      StructField("price", DoubleType)))
    val bad = Sources.csv(spark, s"$tmp/orders_csv", schema)
    intercept[Exception] { bad.collect() }
  }
}
