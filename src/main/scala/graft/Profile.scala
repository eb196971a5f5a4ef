package graft

/** Dev-only stage profiler: times each named query N times back-to-back
  * so cache effects and plan overheads separate from steady-state cost.
  * Not part of the engine surface; the driver never invokes it. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      // committed plan dumps must stay reviewable: iteration queries
      // nest each round's InMemoryRelation child plan, so an uncapped
      // explain of g01 prints ~29k lines of repeated subtrees. Spark
      // truncates with an explicit marker at this cap.
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("PROFILE_MAX_PLAN_CHARS", "120000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)")
      .write.mode("overwrite").format("noop").save()
    val reps = sys.env.getOrElse("PROFILE_REPS", "3").toInt
    // PROFILE_STAGES=1: per-stage cpu/tasks/rows dump — attributes a
    // query's cost to individual stages (callSite names the operator)
    if (sys.env.get("PROFILE_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"cpu=${if (m == null) 0L else m.executorCpuTime / 1000000L}%6d ms " +
            f"in=${if (m == null) 0L else m.inputMetrics.recordsRead}%9d " +
            f"sh_r=${if (m == null) 0L else m.shuffleReadMetrics.recordsRead}%9d " +
            f"sh_w=${if (m == null) 0L else m.shuffleWriteMetrics.recordsWritten}%9d  " +
            si.details.linesIterator.find(_.contains("graft")).getOrElse(si.name.takeWhile(_ != '\n')).trim.take(100))
        }
      })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // PROFILE_EXPLAIN=1: initial formatted plan; =2: the FINAL
      // adaptive plan (executes the query first, so codegen spans and
      // AQE decisions show as they actually ran)
      if (sys.env.get("PROFILE_EXPLAIN").contains("1"))
        println(s"=== $name ===\n" + fn(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      if (sys.env.get("PROFILE_EXPLAIN").contains("2")) {
        val df = fn(spark, sfDir)
        // drive the df's OWN executedPlan (a writer would build a fresh
        // QueryExecution and this plan would never finalize)
        df.queryExecution.executedPlan.execute().count()
        println(s"=== $name (final) ===\n" + df.queryExecution.executedPlan)
      }
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name rep$r $sec%.3f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
