package graft.tools

// temporary profiling harness for d07 — removed once diagnosed
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup
    spark.read.parquet(s"$d/documents.parquet").count()
    val q = graft.ext.Dedup.queries
    time("stage: shingles")    { graft.ext.Dedup.profileShingles(spark, d) }
    time("stage: minhash")     { graft.ext.Dedup.profileMinhash(spark, d) }
    time("stage: candidates")  { graft.ext.Dedup.profileCandidates(spark, d) }
    time("d06 first")  { q("d06_lsh_verified_neardup")(spark, d).write.mode("overwrite").format("noop").save() }
    time("d06 second") { q("d06_lsh_verified_neardup")(spark, d).write.mode("overwrite").format("noop").save() }
    time("d07 first")  { q("d07_neardup_clusters")(spark, d).write.mode("overwrite").format("noop").save() }
    time("d07 second") { q("d07_neardup_clusters")(spark, d).write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
