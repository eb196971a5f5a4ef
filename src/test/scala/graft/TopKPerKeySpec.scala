package graft

import graft.plans.TopKPerKey
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  private def base() = Tables.orders(spark, sfDir)
    .select(col("o_custkey"), round(col("o_totalprice"), 2).as("price"), col("o_orderkey"))

  test("custom operator matches the window row_number formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val got = TopKPerKey.topKPerKey(base(), 3,
      Seq(col("o_custkey")), Seq(col("price").desc, col("o_orderkey")))
      .select("o_custkey", "price", "o_orderkey")
    val w = Window.partitionBy("o_custkey").orderBy(col("price").desc, col("o_orderkey"))
    val want = base().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "price", "o_orderkey")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("plans as partial + final stages around one exchange") {
    val df = TopKPerKey.topKPerKey(base(), 3,
      Seq(col("o_custkey")), Seq(col("price").desc, col("o_orderkey")))
    df.collect()
    // AQE renders final + initial plans; audit the final one only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("per key at most k rows; every emitted row belongs to its key's true top-k") {
    val got = TopKPerKey.topKPerKey(base(), 2,
      Seq(col("o_custkey")), Seq(col("price").desc, col("o_orderkey")))
    val sizes = got.groupBy("o_custkey").count()
    assert(sizes.filter(col("count") > 2).count() == 0)
    // a kept row is never beaten by 2+ rows of the same key
    val all = base()
    val beaten = got.as("g").join(all.as("a"),
        col("g.o_custkey") === col("a.o_custkey") &&
        (col("a.price") > col("g.price") ||
          (col("a.price") === col("g.price") && col("a.o_orderkey") < col("g.o_orderkey"))))
      .groupBy(col("g.o_custkey"), col("g.o_orderkey")).count()
      .filter(col("count") >= 2)
    assert(beaten.count() == 0)
  }

  test("generic TopK aggregator works for an arbitrary type and ordering") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    // shortest-two words per language — nothing price-shaped about it
    implicit val ord: Ordering[(Int, String)] = Ordering.Tuple2
    val top2 = new graft.functions.TopK[(Int, String)](2)(
      ord, ExpressionEncoder())
    val got = Seq(("en", "aaa"), ("en", "b"), ("en", "cc"), ("id", "dddd"), ("id", "e"))
      .toDF("lang", "word").as[(String, String)]
      .map { case (l, w) => (l, (w.length, w)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(top2.toColumn.name("topk"))
      .collect().toMap
    assert(got("en") == Seq((1, "b"), (2, "cc")))
    assert(got("id") == Seq((1, "e"), (4, "dddd")))
  }

  test("k larger than any group degenerates to the full input") {
    val got = TopKPerKey.topKPerKey(base(), 1000000,
      Seq(col("o_custkey")), Seq(col("price").desc, col("o_orderkey")))
    assert(got.count() == base().count())
  }
}
