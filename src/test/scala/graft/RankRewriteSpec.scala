package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RankToTopKRule: the row_number()<=k window idiom must execute as the
  * TopKPerKey operator when (and only when) the rank column is dead.
  */
class RankRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def orders = graft.sources.Tables.orders(spark, sfDir)
  private val w = Window.partitionBy($"o_custkey")
    .orderBy($"o_totalprice".desc, $"o_orderkey")

  private def topkIdiom(k: Int) = orders
    .withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
    .select($"o_custkey", $"o_orderkey")

  test("dead-rank top-k idiom plans as TopKPerKey, not Window") {
    val plan = planOf(topkIdiom(3))
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "), plan)
  }

  test("rewritten plan returns exactly the window formulation's rows") {
    // keeping rn in the output suppresses the rewrite -> stock Window plan
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn")
    assert(planOf(viaWindow).contains("Window"), "control plan must use Window")
    val got = topkIdiom(3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = viaWindow.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(want))
  }

  test("live rank column suppresses the rewrite") {
    val kept = orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"rn")
    assert(!planOf(kept).contains("TopKPerKeyFinal"))
  }

  test("global (unpartitioned) rank idiom is not rewritten") {
    val g = Window.orderBy($"o_totalprice".desc, $"o_orderkey")
    val df = orders.withColumn("rn", row_number().over(g)).filter($"rn" <= 5)
      .drop("rn").select($"o_orderkey")
    assert(!planOf(df).contains("TopKPerKeyFinal"))
    assert(df.count() == 5)
  }

  test("rank() (not row_number) is not rewritten") {
    val rk = orders.withColumn("rn", rank().over(w)).filter($"rn" <= 3).drop("rn")
      .select($"o_custkey", $"o_orderkey")
    assert(!planOf(rk).contains("TopKPerKeyFinal"))
  }

  test("extra filter conjuncts survive the rewrite") {
    val df = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3 && $"o_totalprice" > 1000.0)
      .drop("rn").select($"o_custkey", $"o_orderkey")
    val plan = planOf(df)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    val control = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3 && $"o_totalprice" > 1000.0)
      .select($"o_custkey", $"o_orderkey")
    assert(df.collect().map(_.toString).sorted
      .sameElements(control.collect().map(_.toString).sorted))
  }
}
