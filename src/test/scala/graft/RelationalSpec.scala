package graft

import graft.queries.Relational

/** Correctness smoke + plan-shape tests for the relational module.
  * Full value-level correctness is the DuckDB differential gate
  * (tools/check.py / driver CORRECTNESS); here we assert invariants and
  * that the physical plans have the shape we designed for 100 TB.
  */
class RelationalSpec extends SparkSpec {

  test("every relational query runs and q01/q02 are non-empty") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, name)
    }
    assert(Relational.queries("q01_pricing_summary")(spark, sfDir).count() == 6)
    assert(Relational.queries("q02_topk_orders")(spark, sfDir).count() == 10)
  }

  test("oracle SQL exists for every relational query") {
    assert(Relational.queries.keySet == Relational.oracle.keySet)
  }

  test("q06 pushes its filters into the parquet scan") {
    val plan = planOf(Relational.queries("q06_scan_filter_agg")(spark, sfDir))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
    // column pruning: tax/returnflag are not referenced, must not be read
    assert(!plan.contains("l_tax"), "scan should prune l_tax")
  }

  test("q03 broadcasts the customer dim — no shuffle of the fact side for it") {
    val plan = planOf(Relational.queries("q03_shipping_priority")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q05 star join broadcasts all dims") {
    val plan = planOf(Relational.queries("q05_star_join_revenue")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q09 anti-join + q04 semi-join plan as joins, not subquery loops") {
    assert(planOf(Relational.queries("q09_anti_join")(spark, sfDir))
      .contains("LeftAnti"))
    assert(planOf(Relational.queries("q04_semi_join_exists")(spark, sfDir))
      .contains("LeftSemi"))
  }

  test("q02 top-k is TakeOrderedAndProject (no global sort)") {
    val plan = planOf(Relational.queries("q02_topk_orders")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q20 idempotent load: re-loading loaded rows yields zero new rows") {
    val loaded = Relational.queries("q20_idempotent_load")(spark, sfDir)
    // the gate: anything already present (by custkey) must not reappear
    import org.apache.spark.sql.functions._
    val again = loaded.select(col("o_custkey"))
      .join(loaded.select(col("o_custkey").as("e")), col("o_custkey") === col("e"), "left_anti")
    assert(again.count() == 0)
  }
}
