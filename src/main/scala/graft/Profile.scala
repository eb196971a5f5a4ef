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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)")
      .write.mode("overwrite").format("noop").save()
    val reps = sys.env.getOrElse("PROFILE_REPS", "3").toInt
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
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
