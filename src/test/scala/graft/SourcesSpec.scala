package graft

import graft.sources.{Sources, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private val tmp = "/tmp/graft-sources-spec"

  test("csv round-trip preserves values under an explicit schema") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), round(col("o_totalprice"), 2).as("price"))
    Sources.writeCsv(orders, s"$tmp/orders_csv")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("price", DoubleType)))
    val back = Sources.csv(spark, s"$tmp/orders_csv", schema)
    assert(back.schema == schema)
    assert(back.exceptAll(orders).count() == 0 && orders.exceptAll(back).count() == 0)
  }

  test("orc round-trip is an exact identity on the documents table") {
    val docs = Tables.documents(spark, sfDir)
    docs.write.mode("overwrite").orc(s"$tmp/docs_orc")
    val back = spark.read.orc(s"$tmp/docs_orc")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)), "schema survives ORC")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("json-lines round-trip preserves nested struct values") {
    import spark.implicits._
    val df = Seq((1L, ("a", 2.5)), (2L, ("b", -1.0)))
      .toDF("id", "payload")
    Sources.writeJsonLines(df, s"$tmp/nested_json")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StructType(Seq(
        StructField("_1", StringType), StructField("_2", DoubleType))))))
    val back = Sources.jsonLines(spark, s"$tmp/nested_json", schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("partitioned write prunes directories on read (PartitionFilters)") {
    val orders = Tables.orders(spark, sfDir)
      .withColumn("yr", year(col("o_orderdate")))
    Sources.writePartitioned(orders, s"$tmp/orders_by_year", Seq("yr"))
    val read = spark.read.parquet(s"$tmp/orders_by_year").filter(col("yr") === 1997)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan)
    // pruned read returns exactly the 1997 slice
    assert(read.count() == orders.filter(col("yr") === 1997).count())
  }

  test("fact sink: double load is a no-op (idempotent partition overwrite)") {
    val (raw, meta, existing) = graft.queries.Pipelines.fixture(spark)
    val fact = graft.plans.FactPipeline.run(raw, meta, existing)
    val path = s"$tmp/fact_sink"
    Sources.writeFact(fact, path)
    val once = spark.read.parquet(path).collect().toSet
    Sources.writeFact(fact, path) // re-run the load
    val twice = spark.read.parquet(path).collect().toSet
    assert(twice == once, "second load must be a clean replace, not an append")
    assert(once.size == fact.count())
  }

  test("fact sink: loading one statement never rewrites the others") {
    import spark.implicits._
    val (raw, meta, existing) = graft.queries.Pipelines.fixture(spark)
    val fact = graft.plans.FactPipeline.run(raw, meta, existing)
    val path = s"$tmp/fact_sink_partial"
    Sources.writeFact(fact, path)
    // a revised TLKM statement arrives: only its partition may change
    val revised = fact.filter($"kode_emiten" === "TLKM")
      .withColumn("nilai", $"nilai" * 2)
    Sources.writeFact(revised, path)
    val back = spark.read.parquet(path)
    val bbniBefore = fact.filter($"kode_emiten" === "BBNI").drop(
      "kode_emiten", "tahun", "quartal", "grup_laporan_keuangan").collect().toSet
    val bbniAfter = back.filter($"kode_emiten" === "BBNI").drop(
      "kode_emiten", "tahun", "quartal", "grup_laporan_keuangan").collect().toSet
    assert(bbniAfter == bbniBefore, "untouched partitions must survive the upsert")
    assert(back.filter($"kode_emiten" === "TLKM" && $"item" === "Jumlah aset")
      .head.getAs[Double]("nilai") == 1e13, "revised partition must be replaced")
  }

  test("mergeParquet: upsert + tombstone semantics, key-scoped rewrite, idempotent") {
    import spark.implicits._
    val path = s"$tmp/merge_tbl"
    graft.util.Scratch.deleteRecursively(new java.io.File(path))
    // 8 buckets over long keys 1..40: every bucket populated
    val t0 = (1L to 40L).map(k => (k, s"v$k", k * 10))
      .toDF("k", "name", "amt").withColumn("del", lit(false))
    Sources.mergeParquet(spark, path, t0, Seq("k"), Some("del"), numBuckets = 8)
    assert(spark.read.parquet(path).count() == 40)
    // batch: replace k=1 (new amt), delete k=2, insert k=100
    val batch = Seq((1L, "v1b", 999L, false), (2L, "x", 0L, true),
      (100L, "v100", 1000L, false)).toDF("k", "name", "amt", "del")
    Sources.mergeParquet(spark, path, batch, Seq("k"), Some("del"), numBuckets = 8)
    def state() = spark.read.parquet(path).select("k", "name", "amt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val s1 = state()
    assert(s1.size == 40, "40 - 1 delete + 1 insert")
    assert(s1((1L, "v1b", 999L)), "matched key replaced")
    assert(!s1.exists(_._1 == 2L), "tombstoned key removed")
    assert(s1((100L, "v100", 1000L)), "unmatched key inserted")
    assert(s1((3L, "v3", 30L)), "untouched key intact")
    // idempotence: the same batch again is a no-op
    Sources.mergeParquet(spark, path, batch, Seq("k"), Some("del"), numBuckets = 8)
    assert(state() == s1, "double merge must be a clean replace")
    // bucket layout holds: dirs are kb=N and most survive untouched
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("kb=")).map(_.getPath.getName).toSet
    assert(dirs.size >= 5, s"bucket layout missing: $dirs")
  }

  test("mergeParquet: current-state read prunes to the affected buckets only") {
    import spark.implicits._
    val path = s"$tmp/merge_prune"
    graft.util.Scratch.deleteRecursively(new java.io.File(path))
    val t0 = (1L to 64L).map(k => (k, k)).toDF("k", "v").withColumn("del", lit(false))
    Sources.mergeParquet(spark, path, t0, Seq("k"), Some("del"), numBuckets = 8)
    // the plan shape mergeParquet builds internally: filter on kb isin
    val affected = Seq(5L).toDF("k").select(
      pmod(xxhash64(col("k")), lit(8L)).cast("int").as("kb"))
      .collect().map(_.getInt(0))
    val cur = spark.read.parquet(path)
      .filter(col("kb").isin(affected.map(Int.box).toIndexedSeq: _*))
    val plan = cur.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("kb"),
      s"bucket filter must prune at listing time:\n$plan")
  }

  test("mergeParquet: a batch that empties a bucket removes its directory") {
    import spark.implicits._
    val path = s"$tmp/merge_empty"
    graft.util.Scratch.deleteRecursively(new java.io.File(path))
    // single bucket per key group: numBuckets=2 so keys split cleanly
    val t0 = (1L to 10L).map(k => (k, k)).toDF("k", "v").withColumn("del", lit(false))
    Sources.mergeParquet(spark, path, t0, Seq("k"), Some("del"), numBuckets = 2)
    // delete EVERY key in bucket of k (pmod(xxhash64(k),2)) = 0
    val b0keys = (1L to 10L).filter { k =>
      Seq(k).toDF("k").select(pmod(xxhash64(col("k")), lit(2L)))
        .head().getLong(0) == 0L
    }
    assert(b0keys.nonEmpty && b0keys.size < 10, "fixture must split buckets")
    val killAll = b0keys.map(k => (k, k, true)).toDF("k", "v", "del")
    Sources.mergeParquet(spark, path, killAll, Seq("k"), Some("del"), numBuckets = 2)
    val left = spark.read.parquet(path).select("k").collect().map(_.getLong(0)).toSet
    assert(left == (1L to 10L).toSet -- b0keys, "only the other bucket survives")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "kb=0")),
      "emptied bucket directory must be deleted, not left stale")
  }

  test("mergeParquet: null or duplicate update keys fail loudly") {
    import spark.implicits._
    val path = s"$tmp/merge_bad"
    graft.util.Scratch.deleteRecursively(new java.io.File(path))
    val t0 = Seq((1L, 1L)).toDF("k", "v").withColumn("del", lit(false))
    Sources.mergeParquet(spark, path, t0, Seq("k"), Some("del"))
    val dup = Seq((5L, 1L, false), (5L, 2L, false)).toDF("k", "v", "del")
    val e1 = intercept[IllegalArgumentException] {
      Sources.mergeParquet(spark, path, dup, Seq("k"), Some("del"))
    }
    assert(e1.getMessage.contains("duplicate"))
    val nul = Seq((Option.empty[Long], 1L, false)).toDF("k", "v", "del")
    val e2 = intercept[IllegalArgumentException] {
      Sources.mergeParquet(spark, path, nul, Seq("k"), Some("del"))
    }
    assert(e2.getMessage.contains("null"))
  }

  test("source catalog: discovery skips non-matching sources and counts hits") {
    // 'neraca' is absent from the first source (meta_csv) and present in
    // the second (raw_json): first-match-in-order must return raw_json
    val row = graft.queries.Advanced.queries("v11_source_catalog")(spark, sfDir).head
    assert(row.getString(0) == "raw_json")
    assert(row.getLong(1) == 11L, "both filings' Neraca rows")
    // the fixture dir now exists — probe the csv source directly
    val metaSrc = graft.sources.CatalogSource("meta_csv",
      graft.util.Scratch.dir("catalog_fixture") + "/meta_csv", "csv", StructType(Seq(
        StructField("filing_id", StringType), StructField("key", StringType),
        StructField("value", StringType))))
    import graft.sources.SourceCatalog
    assert(SourceCatalog.discover(spark, Seq(metaSrc), "laporan").map(_.name)
      .contains("meta_csv"), "keyword in a key cell must match")
    assert(SourceCatalog.discover(spark, Seq(metaSrc), "zzzz-absent").isEmpty)
  }

  test("spread takes the round-robin branch on few-file scans, passthrough otherwise") {
    val p = spark.sparkContext.defaultParallelism
    val src = Tables.orders(spark, sfDir).select(col("o_orderkey"))
    src.coalesce(1).write.mode("overwrite").parquet(s"$tmp/spread_few")
    src.repartition(p + 1).write.mode("overwrite").parquet(s"$tmp/spread_many")
    val few = spark.read.parquet(s"$tmp/spread_few")
    assert(!(Tables.spread(few) eq few), "single-file scan must round-robin")
    // the production passthrough is the BYTES guarantee: total >= p x
    // maxPartitionBytes means >= p byte-range splits with no probe at
    // all — pinned by object identity under a lowered maxPartitionBytes
    // (test files are KBs; the ratio is what the branch keys on)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    val many = s2.read.parquet(s"$tmp/spread_many")
    assert(Tables.spread(many) eq many,
      "bytes >= parallelism x maxPartitionBytes must pass through probe-free")
    // the repartition must not change results
    assert(Tables.spread(few).exceptAll(few).count() == 0)
  }

  test("jdbc sink: key-scoped delete-then-insert is idempotent per statement") {
    import spark.implicits._
    // embedded Derby, in-memory: the JDK-resident stand-in for the
    // reference's MySQL store — same JDBC semantics, zero network
    val url = "jdbc:derby:memory:graftdb;create=true"
    val key = Seq("kode", "tahun")
    val props = new java.util.Properties
    // Derby can't =-compare its default CLOB mapping for strings; pin
    // key-able types at table creation (standard Spark JDBC option)
    props.setProperty("createTableColumnTypes", "kode VARCHAR(32), item VARCHAR(64)")
    def load(rows: Seq[(String, Int, String, Double)]): Unit =
      Sources.upsertJdbc(rows.toDF("kode", "tahun", "item", "nilai"),
        url, "fakta", key, props)
    def snapshot(): Set[(String, Int, String, Double)] =
      spark.read.jdbc(url, "fakta", new java.util.Properties)
        .as[(String, Int, String, Double)].collect().toSet
    val stmtA = Seq(("TLKM", 2023, "aset", 100.5), ("TLKM", 2023, "kas", 40.0))
    val stmtB = Seq(("BBRI", 2023, "aset", 77.25))
    load(stmtA)                         // first load creates the table
    load(stmtB)                         // a second statement
    assert(snapshot() == (stmtA ++ stmtB).toSet)
    load(stmtA)                         // double load must be a no-op
    assert(snapshot() == (stmtA ++ stmtB).toSet, "re-load duplicated rows")
    val revisedA = Seq(("TLKM", 2023, "aset", 999.0))
    load(revisedA)                      // revision replaces ONLY its key
    assert(snapshot() == (revisedA ++ stmtB).toSet,
      "revision must replace the statement and leave others untouched")
  }

  test("jdbc sink: row-level key fails loudly at the maxKeys fence") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftdb_fence;create=true"
    val rows = (1 to 50).map(i => (s"K$i", 2023, "aset", 1.0))
    val e = intercept[IllegalArgumentException] {
      Sources.upsertJdbc(rows.toDF("kode", "tahun", "item", "nilai"),
        url, "fakta_fence", Seq("kode", "tahun"), maxKeys = 10)
    }
    assert(e.getMessage.contains("statement-shaped"), e.getMessage)
  }

  test("jdbc sink: a non-table-missing probe failure fails the load, not the idempotence") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftdb_probe;create=true"
    // a syntactically invalid table name makes the existence probe throw
    // a NON-not-found SQLState (Derby 42X01 syntax error); swallowing it
    // would skip the DELETE and silently duplicate on re-load — the sink
    // must rethrow instead of degrading to a plain append
    intercept[java.sql.SQLException] {
      Sources.upsertJdbc(Seq(("TLKM", 2023, "aset", 1.0))
          .toDF("kode", "tahun", "item", "nilai"),
        url, "fakta WHERE", Seq("kode", "tahun"))
    }
  }

  test("spread catches many tiny files packed below parallelism") {
    // isolated session: zero open cost + minPartitionNum=1 makes the
    // packer collapse the tiny files into one scan task — the layout the
    // skew guard exists for, invisible to a file-count-only check
    val s = spark.newSession()
    s.conf.set("spark.sql.files.openCostInBytes", "0")
    s.conf.set("spark.sql.files.minPartitionNum", "1")
    val p = s.sparkContext.defaultParallelism
    Tables.orders(spark, sfDir).select(col("o_orderkey")).limit(200)
      .repartition(p + 1).write.mode("overwrite").parquet(s"$tmp/spread_tiny")
    val tiny = s.read.parquet(s"$tmp/spread_tiny")
    assert(tiny.rdd.getNumPartitions < p,
      s"precondition: expected the packer to collapse ${p + 1} tiny files")
    val spreadDf = Tables.spread(tiny)
    assert(!(spreadDf eq tiny), "packed tiny-file scan must round-robin")
    assert(spreadDf.rdd.getNumPartitions >= p)
    assert(spreadDf.exceptAll(tiny).count() == 0)
  }

  test("spread passes through a single file with many row groups") {
    // production tables are often ONE large file with thousands of row
    // groups — parquet splits it by byte range at row-group granularity,
    // so it parallelizes fine and spread must NOT shuffle it. File count
    // is 1 here, the exact layout a file-count-only check would wrongly
    // round-robin; the bytes guard keys on total scan bytes instead.
    val s = spark.newSession()
    s.conf.set("spark.sql.files.maxPartitionBytes", "64k")
    val p = s.sparkContext.defaultParallelism
    // tiny parquet.block.size forces a row-group flush every ~64 KB, so
    // the single file carries many row groups like a production file
    spark.range(0, 50000)
      .select(col("id"), md5(col("id").cast("string")).as("pad"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .option("parquet.page.size", 8 * 1024)
      .parquet(s"$tmp/spread_rowgroups")
    val one = s.read.parquet(s"$tmp/spread_rowgroups")
    assert(one.inputFiles.length == 1, "precondition: a single file")
    assert(one.rdd.getNumPartitions >= p,
      "precondition: the one file must split into >= parallelism scan tasks")
    assert(Tables.spread(one) eq one,
      "a many-row-group single file must pass through untouched")
  }

  test("spread repartitions a big-bytes scan whose row groups exceed maxPartitionBytes") {
    // byte math alone promises >= p splits, but a task only works if a
    // row-group midpoint lands in its range: one file with ONE row
    // group (default 128 MB block size) under a tiny maxPartitionBytes
    // is the starved layout the sampled-footer check must catch
    val s = spark.newSession()
    s.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    val p = s.sparkContext.defaultParallelism
    spark.range(0, 50000)
      .select(col("id"), md5(col("id").cast("string")).as("pad"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/spread_bigrg")
    val one = s.read.parquet(s"$tmp/spread_bigrg")
    assert(one.inputFiles.length == 1, "precondition: a single file")
    val out = Tables.spread(one)
    assert(!(out eq one), "a single-row-group big-bytes scan must round-robin")
    assert(out.rdd.getNumPartitions >= p)
    assert(out.exceptAll(one).count() == 0)
  }

  test("compaction shrinks a small-files layout to the byte-target count") {
    val docs = Tables.documents(spark, sfDir)
    docs.repartition(48).write.mode("overwrite").parquet(s"$tmp/compact_in")
    val inBytes = new java.io.File(s"$tmp/compact_in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = inBytes / 3 + 1
    val (before, after, bytes) =
      Sources.compactParquet(spark, s"$tmp/compact_in", s"$tmp/compact_out", target)
    assert(before == 48 && bytes == inBytes)
    assert(after == 3, s"expected ceil(bytes/target)=3 outputs, got $after")
    val outFiles = new java.io.File(s"$tmp/compact_out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(outFiles.length == 3, "on-disk file count matches the plan")
    val back = spark.read.parquet(s"$tmp/compact_out")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("compaction splits an oversized single file when the target demands it") {
    val docs = Tables.documents(spark, sfDir)
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/split_in")
    val oneBytes = new java.io.File(s"$tmp/split_in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (before, after, _) = Sources.compactParquet(
      spark, s"$tmp/split_in", s"$tmp/split_out", oneBytes / 4 + 1)
    assert(before == 1 && after == 4)
    assert(new java.io.File(s"$tmp/split_out").listFiles()
      .count(_.getName.endsWith(".parquet")) == 4)
    val back = spark.read.parquet(s"$tmp/split_out")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("FAILFAST csv read rejects schema drift loudly") {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("missing_col", TimestampType),
      StructField("price", DoubleType)))
    val bad = Sources.csv(spark, s"$tmp/orders_csv", schema)
    intercept[Exception] { bad.collect() }
  }

  test("normalizeTs dispatches on the observed ts layout (nanos-long, NTZ, LTZ, other)") {
    import spark.implicits._
    // 2021-01-01T00:00:01Z in each physical layout the events table has
    // shipped as across testdata generations
    val micros = 1609459201000000L
    // legacy TIMESTAMP(NANOS) read as raw long via nanosAsLong
    val fromLong = Tables.normalizeTs(
      Seq((1L, micros * 1000L)).toDF("event_id", "ts"))
    assert(fromLong.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(fromLong.select(unix_micros(col("ts"))).head.getLong(0) == micros,
      "nanos truncate to micros")
    // native micros read as TIMESTAMP_NTZ: the UTC session makes the
    // relabel to TimestampType preserve the instant exactly
    val ntz = Seq(1L).toDF("event_id").select(col("event_id"),
      timestamp_micros(lit(micros)).cast(
        org.apache.spark.sql.types.TimestampNTZType).as("ts"))
    val fromNtz = Tables.normalizeTs(ntz)
    assert(fromNtz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head.getLong(0) == micros)
    // already-TimestampType passes through untouched
    val ltz = Seq(1L).toDF("event_id")
      .select(col("event_id"), timestamp_micros(lit(micros)).as("ts"))
    assert(Tables.normalizeTs(ltz) eq ltz)
    // anything else fails loudly rather than miscomputing downstream
    intercept[RuntimeException] {
      Tables.normalizeTs(Seq((1L, "2021-01-01")).toDF("event_id", "ts"))
    }
  }
}
