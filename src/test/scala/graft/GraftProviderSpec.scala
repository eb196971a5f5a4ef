package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** `format("graft")` / `USING graft` (GraftTableProvider): the DSv1
  * surface must plan the SAME FileIndex read as the programmatic
  * `VersionedTable.read` — content, time travel, bucket pruning, and
  * data skipping all ride through. The row-level semantics are
  * oracle-gated (x10); these specs pin the plan behavior. */
class GraftProviderSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = graft.util.Scratch.dir(s"provider_spec_$name")
    graft.util.Scratch.deleteRecursively(new java.io.File(d))
    d
  }

  private def filesRead(df: DataFrame): Long =
    graft.util.PlanMetrics.filesRead(df)

  private def fixture(): String = {
    val dir = freshDir("fixture")
    VersionedTable.merge(spark, dir,
      (1L to 24L).map(k => (k, s"v$k", k.toInt)).toDF("k", "v", "x"),
      Seq("k"), numBuckets = 8)
    VersionedTable.merge(spark, dir,
      Seq((2L, "V2", 200, false), (3L, "", 0, true))
        .toDF("k", "v", "x", "del"),
      Seq("k"), deleteCol = Some("del"), numBuckets = 8)
    dir
  }

  test("format(\"graft\") reads the head snapshot, identical to the programmatic read") {
    val dir = fixture()
    val viaProvider = spark.read.format("graft").load(dir)
      .select($"k", $"v", $"x").as[(Long, String, Int)].collect().toSet
    val viaRead = VersionedTable.read(spark, dir)
      .select($"k", $"v", $"x").as[(Long, String, Int)].collect().toSet
    assert(viaProvider === viaRead)
    assert(!viaProvider.exists(_._1 == 3L), "tombstone must be applied")
  }

  test("versionAsOf time-travels; the pinned relation ignores later merges") {
    val dir = fixture()
    val v0 = spark.read.format("graft")
      .option("versionAsOf", 0).load(dir)
    assert(v0.count() === 24L)
    assert(v0.filter($"k" === 2L).select($"v").as[String].head() === "v2")
    // a merge AFTER the relation was created does not leak into it
    // (the manifest pinned the file set at createRelation time)
    VersionedTable.merge(spark, dir,
      Seq((10L, "CHANGED", 0)).toDF("k", "v", "x"), Seq("k"), numBuckets = 8)
    assert(v0.filter($"k" === 10L).select($"v").as[String].head() === "v10")
    // and the head read through SQL DDL sees the new state
    spark.sql("DROP TABLE IF EXISTS provider_head")
    spark.sql(s"CREATE TABLE provider_head USING graft OPTIONS (path '$dir')")
    assert(spark.sql("SELECT v FROM provider_head WHERE k = 10")
      .as[String].head() === "CHANGED")
  }

  test("bucket pruning and data skipping ride through the provider") {
    val dir = freshDir("prune")
    VersionedTable.merge(spark, dir,
      (0L until 400L).map(k => (k, k, s"T${"%03d".format(k % 40)}"))
        .toDF("k", "x", "t"),
      Seq("k"), numBuckets = 4)
    // key equality → one bucket's file
    val one = spark.read.format("graft").load(dir).filter($"k" === 7L)
    assert(filesRead(one.select($"k")) === 1L,
      "key predicate must prune to one bucket through the provider")
    // chunked clusterBy compact → range predicates skip files, on the
    // numeric AND the string cluster column
    VersionedTable.compact(spark, dir, clusterBy = Seq("x", "t"),
      chunksPerBucket = 8)
    val all = filesRead(spark.read.format("graft").load(dir).select($"k"))
    val ranged = filesRead(spark.read.format("graft").load(dir)
      .filter($"x" < 50L).select($"k"))
    val strEq = filesRead(spark.read.format("graft").load(dir)
      .filter($"t" === "T005").select($"k"))
    assert(ranged < all, s"numeric skipping through provider: $ranged of $all")
    assert(strEq < all, s"string skipping through provider: $strEq of $all")
  }

  test("missing path and bad versionAsOf fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", 1).load()
    }
    assert(e1.getMessage.contains("path"))
    val dir = fixture()
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "latest").load(dir)
    }
    assert(e2.getMessage.contains("versionAsOf"))
    val e3 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", 99).load(dir)
    }
    assert(e3.getMessage.contains("99"), s"missing version names itself: $e3")
  }

  test("write path: save modes map onto key-scoped MERGE") {
    val dir = freshDir("write")
    val base = (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
    // the default (ErrorIfExists) creates the table
    base.write.format("graft")
      .option("keyCols", "k").option("numBuckets", 4).save(dir)
    assert(VersionedTable.read(spark, dir).count() === 10L)
    assert(VersionedTable.snapshot(spark, dir).numBuckets === 4)
    // ErrorIfExists refuses an existing table, loudly
    val e1 = intercept[Exception] {
      base.write.format("graft").option("keyCols", "k").save(dir)
    }
    assert(e1.getMessage.contains("already exists"))
    // append = upsert + tombstones; the table's bucket count is reused
    // (no numBuckets option on this write)
    Seq((2L, "V2", false), (3L, "", true), (11L, "v11", false))
      .toDF("k", "v", "del")
      .write.format("graft").option("keyCols", "k")
      .option("deleteCol", "del").mode("append").save(dir)
    val state = VersionedTable.read(spark, dir)
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(state.size === 10 && state(2L) === "V2" &&
      !state.contains(3L) && state(11L) === "v11")
    assert(VersionedTable.snapshot(spark, dir).numBuckets === 4,
      "append must reuse the existing bucket count")
    // Ignore leaves an existing table untouched
    Seq((99L, "x")).toDF("k", "v").write.format("graft")
      .option("keyCols", "k").mode("ignore").save(dir)
    assert(VersionedTable.read(spark, dir).filter($"k" === 99L).isEmpty,
      "SaveMode.Ignore must not merge into an existing table")
    // Overwrite is refused by design
    val e2 = intercept[Exception] {
      base.write.format("graft").option("keyCols", "k")
        .mode("overwrite").save(dir)
    }
    assert(e2.getMessage.contains("Overwrite"))
    // missing keyCols names the option
    val e3 = intercept[Exception] {
      Seq((1L, "a")).toDF("k", "v").write.format("graft")
        .mode("append").save(freshDir("nokeys"))
    }
    assert(e3.getMessage.contains("keyCols"))
    // idempotent writer ledger through options: a replayed batch skips
    val before = VersionedTable.versions(spark, dir).max
    def txnWrite(): Unit = Seq((5L, "TXN")).toDF("k", "v")
      .write.format("graft").option("keyCols", "k")
      .option("txnAppId", "prov_app").option("txnVersion", "7")
      .mode("append").save(dir)
    txnWrite()
    val after1 = VersionedTable.versions(spark, dir).max
    assert(after1 === before + 1)
    txnWrite() // replay: recognized, no phantom version
    assert(VersionedTable.versions(spark, dir).max === after1)
  }

  test("a bare INSERT INTO is refused at analysis — no invisible writes") {
    val dir = fixture()
    spark.sql("DROP TABLE IF EXISTS provider_ins")
    spark.sql(s"CREATE TABLE provider_ins USING graft OPTIONS (path '$dir')")
    def rootFiles = new java.io.File(dir).listFiles().map(_.getName).toSet
    val before = rootFiles
    val e = intercept[Exception] {
      spark.sql("INSERT INTO provider_ins VALUES (99, 'x', 1)")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(5).map(t => String.valueOf(t.getMessage))
    assert(msgs.exists(_.contains("key-scoped")),
      s"the refusal must name the honest alternative: $e")
    assert(rootFiles === before,
      "the refused insert must leave no junk in the table dir")
  }

  test("writeStream.format(\"graft\"): named sink merges with exactly-once ledger") {
    import org.apache.spark.sql.streaming.Trigger
    val stage = freshDir("sink_stage"); new java.io.File(stage).mkdirs()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$stage/s1")
    // one file per subdir so maxFilesPerTrigger paces deterministically
    val schema = spark.read.parquet(s"$stage/s1").schema
    val table = freshDir("sink_table")
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$stage/*")
        .writeStream.format("graft")
        .option("keyCols", "k").option("numBuckets", 2)
        .option("txnAppId", "sink_spec")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(table)
      q.awaitTermination()
    }
    def tmpCkpt() = java.nio.file.Files
      .createTempDirectory("sink_spec_ckpt").toString
    run(tmpCkpt())
    assert(VersionedTable.read(spark, table)
      .select($"k", $"v").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    val v1 = VersionedTable.versions(spark, table).max
    // FULL replay: fresh checkpoint restarts batch ids; the ledger
    // (txnAppId x batchId) must skip every batch — zero phantom versions
    run(tmpCkpt())
    assert(VersionedTable.versions(spark, table).max === v1,
      "replayed stream must commit nothing")
    // Complete mode is refused at sink creation, loudly
    val e = intercept[Exception] {
      spark.readStream.schema(schema).parquet(s"$stage/*")
        .groupBy($"k").count()
        .writeStream.format("graft")
        .option("keyCols", "k")
        .option("checkpointLocation", tmpCkpt())
        .outputMode("complete").start(freshDir("sink_complete"))
    }
    assert(e.getMessage.contains("Complete"), s"got: ${e.getMessage}")
  }

  test("sink identity defaults to the STREAMING QUERY ID: a replay from a RELOCATED checkpoint still skips") {
    import org.apache.spark.sql.streaming.Trigger
    val stage = freshDir("sinkq_stage"); new java.io.File(stage).mkdirs()
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(s"$stage/s1")
    Seq((2L, "b")).toDF("k", "v").coalesce(1).write.parquet(s"$stage/s2")
    val schema = spark.read.parquet(s"$stage/s1").schema
    val table = freshDir("sinkq_table")
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$stage/*")
        .writeStream.format("graft")
        .option("keyCols", "k").option("numBuckets", 2)
        // NO txnAppId: identity must come from the query id persisted
        // in the checkpoint's metadata file, NOT the checkpoint path
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(table)
      q.awaitTermination()
    }
    val ckptA = freshDir("sinkq_ckptA")
    run(ckptA)
    assert(VersionedTable.read(spark, table)
      .select($"k", $"v").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    val v1 = VersionedTable.versions(spark, table).max
    // RELOCATE the checkpoint (copy A -> B), then force a replay by
    // dropping the newest commit marker: the engine re-runs that batch
    // from B. Were the identity derived from the checkpoint PATH, the
    // replayed batch would arrive under a new appId and re-commit a
    // phantom version; the query id rides along in B's metadata file.
    val ckptB = freshDir("sinkq_ckptB")
    val src = java.nio.file.Paths.get(ckptA)
    val dst = java.nio.file.Paths.get(ckptB)
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val commits = dst.resolve("commits")
    val newest = java.nio.file.Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(newest)
    java.nio.file.Files.deleteIfExists(
      commits.resolve(s".${newest.getFileName}.crc"))
    run(ckptB)
    assert(VersionedTable.versions(spark, table).max === v1,
      "replayed batch from a relocated checkpoint must be recognized " +
        "by the ledger — same query id, zero phantom versions")
    assert(VersionedTable.read(spark, table)
      .select($"k", $"v").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
  }

  test("sink layout cache: a concurrent REBUCKET fails the batch loudly, and the retry re-probes") {
    import graft.sources.GraftStreamSink
    val table = freshDir("sink_rebucket")
    val sink = new GraftStreamSink(spark, table,
      Map("keycols" -> "k"), explicitAppId = Some("rebucket_spec"),
      checkpointLoc = None)
    sink.addBatch(0L, Seq((1L, "a")).toDF("k", "v")) // caches buckets=64
    // an operator rebuckets the table OUT FROM UNDER the stream — the
    // cached layout is now stale; committing against it would scatter
    // keys to the wrong buckets, so the merge MUST refuse
    VersionedTable.rebucket(spark, table, 8)
    val e = intercept[IllegalArgumentException] {
      sink.addBatch(1L, Seq((2L, "b")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("numBuckets"),
      s"the stale-layout refusal must name the bucket count: ${e.getMessage}")
    // the failure invalidated the cache: the engine's batch RETRY
    // re-probes the table and lands under the new layout
    sink.addBatch(1L, Seq((2L, "b")).toDF("k", "v"))
    assert(VersionedTable.read(spark, table)
      .select($"k", $"v").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    assert(VersionedTable.snapshot(spark, table).numBuckets === 8)
    // and the ledger still holds: replaying the landed batch skips
    val vMax = VersionedTable.versions(spark, table).max
    sink.addBatch(1L, Seq((2L, "b")).toDF("k", "v"))
    assert(VersionedTable.versions(spark, table).max === vMax,
      "a replayed batch after recovery must be recognized by the ledger")
  }

  test("available-now with NOTHING published at prepare terminates instead of consuming live") {
    val dir = freshDir("avnow_empty")
    VersionedTable.merge(spark, dir,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    VersionedTable.merge(spark, dir,
      Seq((2L, "b")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    // construct the source while a feed schema exists...
    val srcFeed = new graft.sources.GraftChangeFeedSource(spark, dir)
    // ...then strip ALL publication state and v1's cdc declaration, so
    // prepare genuinely finds nothing published (the read-only-consumer
    // shape: heal publishes nothing, _feed is empty)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_feed"), true)
    val m1 = java.nio.file.Paths.get(dir, "_log", "00000001.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(m1))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("cdcDir"); node.remove("cdcSchema")
    java.nio.file.Files.write(m1, mapper.writeValueAsBytes(node))
    srcFeed.prepareForTriggerAvailableNow()
    // a version published AFTER the trigger started must NOT be drained
    // by this run (the pre-fix bug: an empty latch fell through to a
    // live fetch and kept consuming)
    VersionedTable.merge(spark, dir,
      Seq((3L, "c")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val off = srcFeed.latestOffset(null,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(off === null,
      s"empty-at-prepare available-now run must report no data, got $off")
  }

  test("exists-probe: a genuine FS failure propagates instead of reading as 'absent'") {
    // a throwing FileSystem behind its own scheme — if the write path
    // swallowed this as "table absent", SaveMode.Ignore would proceed
    // to mutate a table it promised to leave alone, and the user would
    // chase a misleading create-path error instead of the outage
    spark.sparkContext.hadoopConfiguration
      .set("fs.failfs.impl", classOf[FailingFs].getName)
    spark.sparkContext.hadoopConfiguration
      .setBoolean("fs.failfs.impl.disable.cache", true)
    Seq(org.apache.spark.sql.SaveMode.Ignore,
        org.apache.spark.sql.SaveMode.ErrorIfExists).foreach { mode =>
      val e = intercept[java.io.IOException] {
        Seq((1L, "a")).toDF("k", "v").write.format("graft")
          .option("keyCols", "k").mode(mode).save("failfs://host/tbl")
      }
      assert(e.getMessage.contains("simulated FS outage"),
        s"$mode must surface the real failure, got: ${e.getMessage}")
    }
  }
}

/** Test-only FileSystem whose metadata calls always fail — simulates a
  * permissions/outage error that is NOT "table absent". */
class FailingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "failfs"
  override def getUri: java.net.URI = java.net.URI.create("failfs://host")
  override def exists(p: org.apache.hadoop.fs.Path): Boolean =
    throw new java.io.IOException("simulated FS outage")
  override def listStatus(p: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    throw new java.io.IOException("simulated FS outage")
  override def getFileStatus(p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus =
    throw new java.io.IOException("simulated FS outage")
}
