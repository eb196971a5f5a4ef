package graft

import graft.ops.ScaleOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
    val plain = li.join(Tables.orders(spark, sfDir)
        .withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val salted = ScaleOps.saltedJoin(li,
        Tables.orders(spark, sfDir).withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", "l_linenumber", 8)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("bloom-pruned join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val pruned = ScaleOps.bloomPrunedJoin(li, urgent, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(plain.exceptAll(pruned).count() == 0)
    assert(pruned.exceptAll(plain).count() == 0)
    // the bloom test must sit in the fact-side scan stage as a
    // might_contain filter over a scalar subquery, before any join
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("AQE splits a deliberately skewed sort-merge join (OptimizeSkewedJoin fires)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // isolated session: the lowered skew thresholds and the disabled
    // broadcast threshold must not leak into suites planning concurrently
    // on the shared session
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // sf0.001-sized skew: the hot partition must exceed BOTH the absolute
    // threshold and factor x median, and the advisory size must be below
    // the threshold so the split produces >1 slice
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    import s.implicits._
    // one hot key (0) carrying 200k padded rows vs 1k-row tails: the
    // post-shuffle partition holding key 0 dwarfs the median
    val left = s.range(0, 220000L)
      .select((when($"id" < 200000L, 0L).otherwise($"id" % 20L + 1L)).as("k"),
        concat(lit("x"), lpad($"id".cast("string"), 48, "0")).as("pad"))
    val right = s.range(0, 21L).select($"id".as("k"), ($"id" * 10).as("dim"))
    val joined = left.join(right, "k")
    // execute THIS queryExecution (a .write/.count would plan a fresh
    // one, and an unexecuted AdaptiveSparkPlanExec still shows the
    // initial, pre-runtime-stats plan) — and the remedy must be
    // semantics-preserving: every left row matches exactly one dim row
    assert(joined.queryExecution.toRdd.count() == 220000L)
    // string match, not a collect: the final plan nests the join inside
    // leaf QueryStageExec wrappers that tree traversal doesn't descend
    val adaptive = joined.queryExecution.executedPlan.asInstanceOf[AdaptiveSparkPlanExec]
    val plan = adaptive.executedPlan.toString
    assert(plan.contains("SortMergeJoin(skew=true)") ||
      plan.contains("isSkewJoin=true") || plan.contains("AQEShuffleRead") && plan.contains("skewed"),
      s"expected OptimizeSkewedJoin to mark the join skew=true:\n${plan.take(3000)}")
  }

  test("bucketed tables join without a shuffle") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    ScaleOps.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    ScaleOps.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must be shuffle-free (warehouse=$wh):\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
