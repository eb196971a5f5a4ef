package graft

import java.sql.Timestamp

import graft.queries.Eventing
import graft.sources.Tables
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-plane tests: replay the bounded events table through
  * MemoryStream and assert the streaming results converge to the batch
  * (DuckDB-checked) answers — the exactly-once contract. */
class StreamingSpec extends SparkSpec {

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Ev].collect().toSeq.sortBy(_.event_id)
  }

  test("streaming tumbling aggregation converges to the batch answer") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStreams.tumblingStream(input.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      val evs = loadEvents()
      val (first, second) = evs.splitAt(evs.length / 2)
      input.addData(first); query.processAllAvailable()
      input.addData(second); query.processAllAvailable()
      val got = spark.table("tumbling_out")
        .orderBy("win_start", "event_type").collect().toSeq
      val want = Eventing.queries("e01_tumbling_window")(spark, sfDir).collect().toSeq
      assert(got == want)
    } finally query.stop()
  }

  test("batch flatMapGroupsWithState sessionization matches session_window exactly") {
    import spark.implicits._
    val evs = spark.createDataset(loadEvents())
    val got = EventStreams.sessionize(evs, streaming = false)
      .toDF().orderBy("user_id", "session_start").collect().toSeq
    val want = Eventing.queries("e03_session_window")(spark, sfDir)
      .select("session_start", "session_end", "user_id", "n_events", "session_value")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(got == want)
  }

  test("streaming sliding-window aggregation converges to the batch answer") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStreams.slidingStream(input.toDF())
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      val evs = loadEvents()
      evs.grouped(math.max(1, evs.length / 3)).foreach { chunk =>
        input.addData(chunk); query.processAllAvailable()
      }
      val got = spark.table("sliding_out")
        .orderBy("win_start", "event_type").collect().toSeq
      val want = Eventing.queries("e02_sliding_window")(spark, sfDir).collect().toSeq
      assert(got == want)
    } finally query.stop()
  }

  test("stream-static broadcast enrichment converges to the batch join") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // bounded dimension: user -> tier, derived deterministically
    val tiers = spark.range(0, 200)
      .select($"id".as("user_id"),
        when($"id" % 3 === 0, "gold").otherwise("basic").as("tier"))
    val input = MemoryStream[Ev]
    val query = EventStreams.enrichedTierCounts(input.toDF(), tiers)
      .writeStream.format("memory").queryName("tier_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      val evs = loadEvents()
      val (first, second) = evs.splitAt(evs.length / 2)
      input.addData(first); query.processAllAvailable()
      input.addData(second); query.processAllAvailable()
      val got = spark.table("tier_out")
        .orderBy("window_start", "tier").collect().toSeq
      val want = spark.createDataset(evs).toDF()
        .join(broadcast(tiers), "user_id")
        .groupBy(window($"ts", "1 hour"), $"tier")
        .agg(count(lit(1)).as("n_events"),
          round(sum($"value"), 2).as("tier_value"))
        .select($"window.start".as("window_start"), $"tier",
          $"n_events", $"tier_value")
        .orderBy("window_start", "tier").collect().toSeq
      assert(got.nonEmpty && got == want)
    } finally query.stop()
  }

  test("stream-stream join converges to the batch join over the same rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStreams.purchaseAttribution(input.toDF())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = loadEvents()
      val (first, second) = evs.splitAt(evs.length / 2)
      input.addData(first); query.processAllAvailable()
      input.addData(second); query.processAllAvailable()
      val got = spark.table("attrib_out")
        .orderBy("p_id", "s_id").collect().toSeq
      val want = EventStreams.purchaseAttribution(
        spark.createDataset(evs).toDF()).orderBy("p_id", "s_id").collect().toSeq
      assert(got == want)
      assert(want.nonEmpty, "fixture must exercise the join")
    } finally query.stop()
  }

  test("stream-stream LEFT OUTER join emits null-extended rows once the watermark proves no match") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStreams.purchaseAttributionOuter(input.toDF())
      .writeStream.format("memory").queryName("attrib_outer_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = loadEvents()
      input.addData(evs); query.processAllAvailable()
      // heartbeats far past the data: the global watermark is the MIN
      // across both branches' watermark nodes, so each heartbeat batch
      // carries one row PER BRANCH (purchase + signup, unjoinable
      // negative users)...
      val far = new java.sql.Timestamp(
        evs.map(_.ts.getTime).max + 365L * 24 * 3600 * 1000)
      input.addData(Ev(-101L, far, -101L, "purchase", 0.0),
        Ev(-102L, far, -102L, "signup", 0.0))
      query.processAllAvailable()
      // ...and a second heartbeat batch, because state flushes in the
      // batch AFTER the advance (the same mechanic e17 stages as files)
      input.addData(Ev(-103L, new java.sql.Timestamp(far.getTime + 1000),
        -103L, "purchase", 0.0),
        Ev(-104L, new java.sql.Timestamp(far.getTime + 1000),
          -104L, "signup", 0.0))
      query.processAllAvailable()
      val got = spark.table("attrib_outer_out").filter($"p_id" >= 0)
        .orderBy("p_id", "s_id").collect().toSeq
      val want = EventStreams.purchaseAttributionOuter(
        spark.createDataset(evs).toDF()).orderBy("p_id", "s_id").collect().toSeq
      assert(got == want)
      val nulls = got.count(_.isNullAt(3))
      assert(nulls > 0, "fixture must exercise the outer (no-match) path")
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark collapses duplicate event ids") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def ev(id: Long, minute: Int): Ev =
        Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), 7L, "click", 1.0)
      // same event delivered three times (at-least-once source) + one distinct
      input.addData(ev(100, 0), ev(100, 0), ev(101, 1))
      query.processAllAvailable()
      input.addData(ev(100, 0)) // replay within the watermark horizon
      query.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(100L, 101L))
    } finally query.stop()
  }

  test("batch funnelize cohorts equal the e10 oracle counts") {
    import spark.implicits._
    val evs = spark.createDataset(loadEvents())
    val hits = EventStreams.funnelize(evs, streaming = false).toDF()
    val byStage = hits.groupBy("stage").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val e10 = Eventing.queries("e10_funnel")(spark, sfDir).head
    assert(byStage.getOrElse(1, 0L) == e10.getLong(0), "stage-1 cohort = n_view")
    assert(byStage.getOrElse(2, 0L) == e10.getLong(1), "stage-2 cohort = n_view_click")
    assert(byStage.getOrElse(3, 0L) == e10.getLong(2), "stage-3 cohort = n_full_funnel")
    // a user reaches each stage at most once
    assert(hits.groupBy("user_id", "stage").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("streaming funnelize over ordered replay matches batch funnelize") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val hits = EventStreams.funnelize(
      input.toDS().withWatermark("ts", "1 hour").as[Ev], streaming = true)
    val query = hits.writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = loadEvents().sortBy(e => (e.ts.getTime, e.event_id))
      val third = evs.length / 3
      input.addData(evs.take(third)); query.processAllAvailable()
      input.addData(evs.slice(third, 2 * third)); query.processAllAvailable()
      input.addData(evs.drop(2 * third)); query.processAllAvailable()
      val got = spark.table("funnel_out")
        .orderBy("user_id", "stage").collect().toSeq
      val want = EventStreams.funnelize(
        spark.createDataset(loadEvents()), streaming = false)
        .toDF().orderBy("user_id", "stage").collect().toSeq
      assert(got == want, "in-order replay must reproduce the batch funnel")
    } finally query.stop()
  }

  test("streaming stateful sessionization emits closed sessions as watermark advances") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = EventStreams.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Ev], streaming = true)
    val query = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def ev(id: Long, minute: Int): Ev =
        Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), 1L, "click", 1.0)
      // session 1: two events 5 min apart; then a >30min gap
      input.addData(ev(1, 0), ev(2, 5)); query.processAllAvailable()
      // advancing event time past 10:05 + 30min closes session 1 via timeout
      input.addData(ev(3, 59)); query.processAllAvailable()
      input.addData(Ev(4, Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      val closed = spark.table("sessions_out").orderBy("session_start").collect()
      assert(closed.length >= 1, "first session must have closed")
      val s1 = closed.head
      assert(s1.getTimestamp(0) == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(s1.getTimestamp(1) == Timestamp.valueOf("2024-01-01 10:35:00"))
      assert(s1.getLong(3) == 2)
    } finally query.stop()
  }

  test("foreachBatch jdbc upsert sink: revised keys replace, replays stay idempotent") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val url = "jdbc:derby:memory:graftstream;create=true"
    val props = new java.util.Properties
    props.setProperty("createTableColumnTypes", "status VARCHAR(16)")
    val input = MemoryStream[(Long, String, Double)]
    val query = EventStreams.jdbcUpsertSink(
        input.toDF().toDF("id", "status", "amount"),
        url, "stream_sink", Seq("id"), props)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_jdbc_ckpt").toString)
      .start()
    try {
      input.addData((1L, "new", 1.0), (2L, "new", 2.0))
      query.processAllAvailable()
      // batch 2 revises id=2 and adds id=3: the serving table must hold
      // ONE row per key with the latest value — the delete-then-insert
      // keying is what makes a replayed micro-batch a no-op too
      input.addData((2L, "paid", 20.0), (3L, "new", 3.0))
      query.processAllAvailable()
      val got = spark.read.jdbc(url, "stream_sink", new java.util.Properties)
        .as[(Long, String, Double)].collect().toSet
      assert(got == Set((1L, "new", 1.0), (2L, "paid", 20.0), (3L, "new", 3.0)))
    } finally query.stop()
  }

  test("checkpoint restart: a new query instance resumes state + offsets and stays exactly-once") {
    // The durability half of the idempotent-load contract on the
    // streaming plane: the query is STOPPED between (and, opportunistically,
    // within) AvailableNow runs and a NEW StreamingQuery instance resumes
    // from the same checkpoint into the durable jdbc sink. The phase-1
    // input files are DELETED before the resume, so the only way the final
    // table can hold the full-corpus aggregate is recovered checkpoint
    // state — a fresh query over the surviving files alone would produce
    // phase 2's partial answer, and a lost file-source offset log would
    // crash on the missing files it would try to re-read.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val stage = s"$root/in"; val ckpt = s"$root/ckpt"
    val url = "jdbc:derby:memory:graftrestart;create=true"
    val table = "agg_restart"
    // Derby maps Spark strings to CLOB, which its DELETE can't compare —
    // pin the key column to VARCHAR (same as the e23 sink spec)
    val props = new java.util.Properties
    props.setProperty("createTableColumnTypes", "event_type VARCHAR(32)")
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val schema = ev.schema
    val n = ev.count()
    val (a, b) = (ev.filter($"event_id" % 2 === 0), ev.filter($"event_id" % 2 =!= 0))
    def addFiles(df: org.apache.spark.sql.DataFrame, sub: String): Unit =
      df.repartition(4).write.parquet(s"$stage/$sub")
    def start() = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // several batches per run → a
        // stop() lands between committed batches, a genuine mid-stream kill
        .parquet(s"$stage/*")
      val agg = stream.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      EventStreams.jdbcUpsertSink(agg, url, table, Seq("event_type"), props)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    def served() = spark.read.jdbc(url, table, new java.util.Properties)
      .as[(String, Long, Double)].collect().toSet
    // phase 1: run over the even-id half, then KILL after at least one
    // batch commits (stop() between micro-batches; if the run already
    // finished, phase 1 degrades to a clean between-runs restart — the
    // assertions below hold either way)
    addFiles(a, "p1")
    val q1 = start()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.isActive && q1.recentProgress.length < 2 &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop(); q1.awaitTermination()
    // resume phase 1 to completion with a SECOND query instance
    val q1b = start(); q1b.awaitTermination()
    val afterA = served()
    assert(afterA.map(_._2).sum == a.count(), "phase 1 must count the even half exactly once")
    // phase 2: new files arrive AND the old input disappears (retention);
    // a third instance resumes from the checkpoint
    addFiles(b, "p2")
    graft.util.Scratch.deleteRecursively(new java.io.File(s"$stage/p1"))
    val q2 = start(); q2.awaitTermination()
    val want = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(served() == want,
      "resumed query must recover aggregate state and never recount old batches")
    assert(served().map(_._2).sum == n)
    // phase 3: restart with NOTHING new — must be a durable no-op
    val q3 = start(); q3.awaitTermination()
    assert(served() == want, "an idle restart must not change the serving table")
  }

  test("online near-dup emits a pair when the LATER doc arrives, across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val sigs = graft.ext.Dedup.docSignatures(
      input.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"))
    val query = EventStreams.nearDupStream(sigs, 0.6)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = (1 to 30).map(i => s"tok$i").mkString(" ")
      val other = (1 to 30).map(i => s"zz$i").mkString(" ")
      // batch 1: two unrelated docs -> no pairs, signatures in state
      input.addData((101L, base), (103L, other))
      query.processAllAvailable()
      assert(spark.table("neardup_out").count() == 0)
      // batch 2: a near-dup of 101 arrives -> the pair emits NOW, from
      // state persisted across batches, exactly once despite the two
      // docs sharing all three bands' buckets
      input.addData((102L, base + " extra"))
      query.processAllAvailable()
      val got = spark.table("neardup_out")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSeq
      assert(got == Seq((101L, 102L)), s"got $got")
      // batch 3: an exact copy of 102 pairs with BOTH seen docs
      input.addData((104L, base + " extra"))
      query.processAllAvailable()
      val all = spark.table("neardup_out")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(all == Set((101L, 102L), (101L, 104L), (102L, 104L)), s"got $all")
      val jac104 = spark.table("neardup_out")
        .filter($"doc_a" === 102L && $"doc_b" === 104L)
        .select($"jaccard").head.getDouble(0)
      assert(jac104 == 1.0, "exact copy pairs at jaccard 1")
    } finally query.stop()
  }
}
