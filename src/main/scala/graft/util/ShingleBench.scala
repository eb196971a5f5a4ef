package graft.util

import org.apache.spark.sql.functions._

/** Scratch microbenchmark for the shingle front end (dev-only). */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet").repartition(32)
    docs.count()

    val cpu = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
      }
    })
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { r =>
        cpu.set(0)
        val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[sb] $name rep$r wall=$wall%.3f s cpu=${cpu.get / 1e9}%.2f s")
      }
    }

    val h = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")

    // current: transform over sequence with element_at on split()
    val toks = split(col("text"), " ")
    val cur = docs.select(col("doc_id"), explode(
      when(size(toks) >= 3, transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array())).as("shs"))
      .select(col("doc_id"), h(col("shs")).as("sh")).distinct()
    time("transform_element_at") { cur.write.mode("overwrite").format("noop").save() }

    // variant A: regexp_extract_all for 3-gram windows? not equivalent; skip.
    // variant B: posexplode the token array, then self-window via lead-free
    //   slice: slice(toks, i, 3) inside the lambda
    val sliced = docs.select(col("doc_id"), explode(
      when(size(toks) >= 3, transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array())).as("shs"))
      .select(col("doc_id"), h(col("shs")).as("sh")).distinct()
    time("transform_slice") { sliced.write.mode("overwrite").format("noop").save() }

    // variant C: materialize the token array in a projection FIRST so the
    //   lambda captures a bound array column, not the split expression
    val pre = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val bound = pre.select(col("doc_id"), explode(
      when(size(col("t")) >= 3, transform(sequence(lit(1), size(col("t")) - 2), i =>
        concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
        .otherwise(array())).as("shs"))
      .select(col("doc_id"), h(col("shs")).as("sh")).distinct()
    time("bound_array") { bound.write.mode("overwrite").format("noop").save() }

    // variant D: no md5 at all — isolate the hash cost
    val nohash = docs.select(col("doc_id"), explode(
      when(size(toks) >= 3, transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array())).as("shs"))
      .select(col("doc_id"), col("shs")).distinct()
    time("no_hash") { nohash.write.mode("overwrite").format("noop").save() }

    // variant E: md5+substring but substring(,1,15) parsed via java-side?
    //   isolate conv(): md5 + substring only, cast via hash? use xxhash64
    val xx = docs.select(col("doc_id"), explode(
      when(size(toks) >= 3, transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array())).as("shs"))
      .select(col("doc_id"), substring(md5(col("shs")), 1, 15).as("sh")).distinct()
    time("md5_no_conv") { xx.write.mode("overwrite").format("noop").save() }

    spark.stop()
  }
}
