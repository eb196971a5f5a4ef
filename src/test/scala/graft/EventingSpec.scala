package graft

import graft.queries.Eventing
import org.apache.spark.sql.functions._

class EventingSpec extends SparkSpec {

  test("every eventing query runs; oracle SQL exists for each") {
    Eventing.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).columns.nonEmpty, name)
    }
    assert(Eventing.queries.keySet == Eventing.oracle.keySet)
  }

  test("streaming harness stages a DIRECTORY-layout table identically to the bare-file layout") {
    // the driver testdata ships events.parquet as one bare FILE; any
    // Spark-written derivation (the sf1 scale corpus) is a DIRECTORY
    // of part files. FileStreamSource does not enumerate through a
    // symlinked subdirectory, so before the per-part staging fix a
    // directory table streamed ZERO files — silently: e13 returned an
    // empty aggregate and e23 failed only at read-back (no Derby table
    // was ever created). Both paths must now agree with the bare-file
    // run bit-for-bit.
    val root = java.nio.file.Files.createTempDirectory("graft-dirlayout").toString
    graft.sources.Tables.events(spark, sfDir)
      .repartition(3) // a genuine multi-part directory
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    for (q <- Seq("e13_stream_tumbling", "e23_jdbc_serving")) {
      val fromDir = Eventing.queries(q)(spark, root).collect().toSeq
      val fromFile = Eventing.queries(q)(spark, sfDir).collect().toSeq
      assert(fromDir.nonEmpty, s"$q streamed zero rows from the directory layout")
      assert(fromDir == fromFile, q)
    }
    graft.util.Scratch.deleteRecursively(new java.io.File(root))
  }

  test("e16 streaming dedup over a doubled source equals the distinct batch table") {
    import org.apache.spark.sql.functions._
    val streamed = Eventing.queries("e16_stream_dedup")(spark, sfDir).collect()
    val batch = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy(col("event_id")).collect()
    assert(streamed.toSeq == batch.toSeq,
      "every doubled row must collapse back to exactly one")
  }

  test("e02 sliding doubles e01 tumbling mass: every event is in exactly 2 windows") {
    val tumblingN = Eventing.queries("e01_tumbling_window")(spark, sfDir)
      .agg(sum("n")).head.getLong(0)
    val slidingN = Eventing.queries("e02_sliding_window")(spark, sfDir)
      .agg(sum("n")).head.getLong(0)
    assert(slidingN == 2 * tumblingN)
  }

  test("e03 sessions: end - start >= gap and events partition exactly") {
    val df = Eventing.queries("e03_session_window")(spark, sfDir)
    val total = df.agg(sum("n_events")).head.getLong(0)
    val events = graft.sources.Tables.events(spark, sfDir).count()
    assert(total == events, "every event lands in exactly one session")
    val bad = df.filter(unix_micros(col("session_end")) - unix_micros(col("session_start")) < 30L * 60 * 1000000)
    assert(bad.count() == 0, "session spans at least the gap")
  }

  test("e09 hash sample keeps roughly 10% and is reproducible") {
    val df = Eventing.queries("e09_hash_sample")(spark, sfDir)
    val sampled = df.agg(sum("n_sampled")).head.getLong(0).toDouble
    val total = graft.sources.Tables.events(spark, sfDir).count().toDouble
    assert(sampled / total > 0.05 && sampled / total < 0.15, s"$sampled of $total")
    assert(df.collect().toSeq == Eventing.queries("e09_hash_sample")(spark, sfDir).collect().toSeq)
  }

  test("e05 as-of: looked-up error precedes the purchase") {
    val purchases = Eventing.queries("e05_asof_join")(spark, sfDir)
      .filter(col("last_error_event").isNotNull)
    val errTs = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id").as("last_error_event"), col("ts").as("err_ts"))
    val pTs = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts").as("p_ts"))
    val bad = purchases.join(errTs, "last_error_event").join(pTs, "event_id")
      .filter(col("err_ts") > col("p_ts"))
    assert(bad.count() == 0)
  }

  test("e10 funnel stages are monotonically narrowing with valid rates") {
    val r = Eventing.queries("e10_funnel")(spark, sfDir).head
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np, "each stage can only narrow the cohort")
    assert(nv > 0 && np > 0, "fixture data reaches the full funnel")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    assert(r.getDouble(4) <= r.getDouble(3), "full-funnel rate <= click rate")
  }

  test("e11 retention: offset-0 cell per cohort equals the cohort size") {
    val df = Eventing.queries("e11_retention_cohorts")(spark, sfDir)
    // every user is active in their own first week, so the k=0 cell is
    // the whole cohort, and later cells can never exceed it
    val zero = df.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    val tooBig = df.join(zero, "cohort_week")
      .filter(col("n_active") > col("cohort_size"))
    assert(tooBig.count() == 0)
    assert(df.filter(col("week_offset") < 0).count() == 0)
  }

  test("e06 range join plans as a hash join on user_id, not a cartesian product") {
    val plan = planOf(Eventing.queries("e06_range_join")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("e18 Markov rows are proper distributions (each source's probabilities sum to 1)") {
    val df = Eventing.queries("e18_markov_transitions")(spark, sfDir)
    val sums = df.groupBy(col("src")).agg(sum(col("p")).as("total")).collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("total") - 1.0) < 1e-4,
        s"${r.get(0)}: ${r.get(1)}")
    }
  }

  test("e19 trending emits ranks 1..3 per hour in non-increasing count order") {
    val df = Eventing.queries("e19_trending_topk")(spark, sfDir)
    assert(df.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // within an hour, count never increases as rank increases
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour")).orderBy(col("rank"))
    val bad = df.withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev_n").isNotNull && col("n") > col("prev_n"))
    assert(bad.count() == 0)
  }
}
