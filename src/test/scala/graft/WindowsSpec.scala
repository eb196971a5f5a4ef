package graft

import graft.queries.Windows
import org.apache.spark.sql.functions._

/** Invariant + plan-shape tests for the window module (value-level
  * correctness is the DuckDB gate). */
class WindowsSpec extends SparkSpec {

  test("every window query runs; oracle SQL exists for each") {
    Windows.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).columns.nonEmpty, name)
    }
    assert(Windows.queries.keySet == Windows.oracle.keySet)
  }

  test("w02 islands: session count is between 1 and event count per user") {
    val df = Windows.queries("w02_gaps_islands")(spark, sfDir)
    val bad = df.filter(col("n_sessions") < 1 || col("n_sessions") > col("n_events"))
    assert(bad.count() == 0)
  }

  test("w03 ranking: row_number is dense 1..k and rnk >= drnk invariant holds") {
    val df = Windows.queries("w03_ranking_topk")(spark, sfDir)
    assert(df.filter(col("rn") > 3 || col("rn") < 1).count() == 0)
    assert(df.filter(col("rnk") < col("drnk")).count() == 0)
  }

  test("w04 running total: final cumulative value equals the customer total") {
    val df = Windows.queries("w04_running_total")(spark, sfDir)
    val finals = df.groupBy("o_custkey").agg(max(col("cum_spend")).as("got"))
    val expected = graft.sources.Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(sum(col("o_totalprice")).as("want"))
    val bad = finals.join(expected, "o_custkey")
      .filter(abs(col("got") - col("want")) > 0.5)
    assert(bad.count() == 0)
  }

  test("w09 two-pass distributed rank equals the single-window w08 exactly") {
    val single = Windows.queries("w08_global_rank")(spark, sfDir).collect().toSeq
    val twoPass = Windows.queries("w09_distributed_rank")(spark, sfDir).collect().toSeq
    assert(twoPass == single)
  }

  test("w09 never plans a window over the full row set in one partition") {
    // the per-range rank must hash-partition on the range id; the only
    // non-partitioned window is the |ranges|-row prefix sum
    val plan = planOf(Windows.queries("w09_distributed_rank")(spark, sfDir))
    assert(plan.contains("hashpartitioning(bkt"),
      s"local ranks must be range-parallel:\n$plan")
  }

  test("partitioned windows shuffle by the partition key only (one exchange)") {
    val plan = planOf(Windows.queries("w02_gaps_islands")(spark, sfDir))
    // both stacked windows + the groupBy reuse the user_id hash partitioning:
    // exactly one shuffle of the events table
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("w12 gap fill: dense axis, zero-filled holes, aggregate total preserved") {
    import org.apache.spark.sql.functions._
    val df = Windows.queries("w12_gap_fill")(spark, sfDir)
    val types = df.select("event_type").distinct().count()
    val hours = df.select("hour").distinct().count()
    assert(df.count() == types * hours, "axis must be the full cross product")
    val total = df.agg(sum("n")).head.getLong(0)
    assert(total == graft.sources.Tables.events(spark, sfDir).count(),
      "fill must add zeros, never rows that change the mass")
  }

  test("w15 ewma: warm-up denominators, bounds, and an exact hand trace") {
    import spark.implicits._
    val df = Windows.queries("w15_ewma")(spark, sfDir).cache()
    // denominator follows the warm-up schedule: 128, 192, 224, ... 255
    val dens = df.select("ewma_den").distinct().as[Long].collect().toSet
    assert(dens.subsetOf(Set(128L, 192L, 224L, 240L, 248L, 252L, 254L, 255L)),
      s"ewma_den must be a truncated geometric sum: $dens")
    // the reported double is the single-division quotient (tolerance:
    // (num/den)*den re-rounds, so compare the division itself)
    val viol = df.filter(abs(col("ewma_cents") -
        col("ewma_num") / col("ewma_den")) > 1e-9).count()
    assert(viol == 0, "ewma = num/den")
    // hand trace: ONE customer's first points (warm-up recursion)
    val firstCust = df.select(min("custkey")).as[Long].head()
    val one = df.filter(col("custkey") === firstCust).orderBy("day").limit(3)
      .select("cents", "ewma_num", "ewma_den").as[(Long, Long, Long)].collect()
    val c0 = one(0)._1
    assert(one(0)._2 == 128 * c0 && one(0)._3 == 128)
    if (one.length > 1) {
      val c1 = one(1)._1
      assert(one(1)._2 == 128 * c1 + 64 * c0 && one(1)._3 == 192)
    }
    df.unpersist()
  }

  test("w13 range frame: every event counts at least itself") {
    import org.apache.spark.sql.functions._
    val df = Windows.queries("w13_range_frame")(spark, sfDir)
    assert(df.filter(col("n_last_hour") < 1).count() == 0)
    assert(df.count() == graft.sources.Tables.events(spark, sfDir).count())
  }
}
