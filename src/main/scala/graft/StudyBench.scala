package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.sources.Tables

/** Measured studies behind three scale claims the scaladocs previously
  * only ASSERTED (round-8 judge items 6-8). Writes study_r9.json,
  * consumed into BASELINE.md.
  *
  * 1. SKEW: a hot-key sort-merge join at sf1 (one synthetic order key
  *    holding ~1/3 of lineitem) timed three ways — AQE skew-join off,
  *    on, and manual salting — so the 100 TB skew story (x08/x14 prove
  *    result-invariance only) carries wall-clock numbers.
  *
  * 2. CONTAINMENT CAP SWEEP: d16's DF-capped inverted index bounds
  *    fan-out, but on THIS corpus the max shingle document frequency is
  *    25, so the DF-64 cap never fires and "no recall loss" was
  *    unmeasurable. Sweeping the cap (4/8/16/64) emulates corpora
  *    4-16x denser relative to the cap: at each cap we record the
  *    count-filter candidate survivors and the FINAL reported pairs vs
  *    the uncapped ground truth — the measured recall curve the DF-64
  *    default rests on.
  *
  * 3. FILTERED ANN: s16 pre-filters before distance computes; when the
  *    filter's survivor count inside a probed cell falls below k, IVF
  *    under-fills and recall collapses — the regime this study maps.
  *    For filter selectivities 1/2 .. 1/400 over the embedding corpus
  *    and nprobe 1/2/4/8, records recall@10 against the pre-filtered
  *    exact answer plus the scored-candidate count (the cost). The
  *    numbers back the nprobe guidance in s16's scaladoc: grow nprobe
  *    (toward a full scan) once expected survivors-per-cell nears k.
  *
  * Usage: runMain graft.StudyBench [sf0.1Dir] [sf1Dir]
  * (sf1Dir must already exist — ScaleSmoke writes it.)
  */
object StudyBench {

  private def j(v: Double) =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  // ---- 1. hot-key join: AQE skew split vs salting vs nothing --------

  /** One synthetic hot key absorbing ~1/3 of the fact side. The salt is
    * derived from the PRE-remap key pair, so it is deterministic and
    * spreads the hot key across 16 sub-keys; the dim side replicates
    * 16x for the hot key only (the standard asymmetric salting: the
    * small side pays the replication, the big side only a hash). */
  private def skewStudy(s: SparkSession, d: String): String = {
    val hot = -42L
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("k",
        when(col("l_orderkey") % 3 === 0, lit(hot)).otherwise(col("l_orderkey")))
    val ord = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .union(s.range(1).select(lit(hot).as("o_orderkey"),
        lit("0-HOT").as("o_orderpriority")))
      .withColumnRenamed("o_orderkey", "k")
    def agg(joined: DataFrame): Seq[(String, Long, Double)] =
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
        .orderBy(col("o_orderpriority"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    def withConf[T](pairs: (String, String)*)(f: => T): T = {
      val prev = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
      pairs.foreach { case (k, v) => s.conf.set(k, v) }
      try f
      finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
    // force the shuffle join: a broadcast of the dim side would hide
    // the skew entirely (and IS the right plan at this dim size — the
    // study manufactures the regime where the dim no longer fits)
    val noBcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val (plainRes, plainSec) = withConf(
      noBcast :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      time(agg(li.join(ord, "k")))
    }
    val (aqeRes, aqeSec) = withConf(
      noBcast :+ ("spark.sql.adaptive.skewJoin.enabled" -> "true")
        :+ ("spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
        :+ ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB"): _*) {
      time(agg(li.join(ord, "k")))
    }
    val (saltRes, saltSec) = withConf(
      noBcast :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      time {
        val nSalt = 16
        val liS = li.withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(nSalt.toLong)))
        val ordS = ord.withColumn("salt",
          explode(array((0 until nSalt).map(i => lit(i.toLong)): _*)))
        agg(liS.join(ordS, Seq("k", "salt")))
      }
    }
    require(plainRes == aqeRes && plainRes == saltRes,
      "skew variants must agree bit-for-bit")
    val hotRows = plainRes.find(_._1 == "0-HOT").map(_._2).getOrElse(0L)
    val total = plainRes.map(_._2).sum
    s""""skew_join_sf1":{"hot_rows":$hotRows,"total_rows":$total,
       |"plain_smj_sec":${j(plainSec)},"aqe_skew_sec":${j(aqeSec)},
       |"salted_sec":${j(saltSec)}}""".stripMargin.replace("\n", "")
  }

  // ---- 2. containment cap sweep --------------------------------------

  /** d16's pipeline with a parameterized posting-list cap; cap >= the
    * corpus max df (64 here, max df 25) IS the uncapped ground truth.
    * Returns (count-filter survivors, reported pairs). */
  private def containmentAtCap(s: SparkSession, d: String, cap: Int): (Long, Long) = {
    import s.implicits._
    val sh = Dedup.shingleHashes(Tables.documents(s, d), $"doc_id", $"text")
      .persist()
    sh.count()
    try {
      val rare = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .filter($"df" <= cap).select($"sh")
      val kept = sh.join(rare, "sh").persist()
      kept.count()
      try {
        val candCnt = kept.select($"sh", $"doc_id".as("doc_a"))
          .join(kept.select($"sh", $"doc_id".as("doc_b")), "sh")
          .filter($"doc_a" =!= $"doc_b")
          .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("c_capped"))
        val docStats = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
          .join(kept.groupBy($"doc_id").agg(count(lit(1)).as("n_kept")),
            Seq("doc_id"), "left")
          .select($"doc_id", $"n",
            ($"n" - coalesce($"n_kept", lit(0L))).as("n_stop"))
        val cand = candCnt
          .join(docStats.select($"doc_id".as("doc_a"),
            $"n".as("na_pre"), $"n_stop".as("stop_a")), "doc_a")
          .filter(($"c_capped" + $"stop_a") * 10000000L >= $"na_pre" * 7999995L)
          .select($"doc_a", $"doc_b").persist()
        val nCand = cand.count()
        val shArr = sh.groupBy($"doc_id").agg(collect_list($"sh").as("arr"))
          .withColumn("n", size($"arr").cast("long"))
        val nRes = cand
          .join(shArr.select($"doc_id".as("doc_a"), $"arr".as("arr_a"),
            $"n".as("na")), "doc_a")
          .join(shArr.select($"doc_id".as("doc_b"), $"arr".as("arr_b")), "doc_b")
          .withColumn("n_inter", size(array_intersect($"arr_a", $"arr_b")).cast("long"))
          .filter(round($"n_inter" / $"na", 6) >= 0.8)
          .count()
        cand.unpersist(blocking = false)
        (nCand, nRes)
      } finally kept.unpersist(blocking = false)
    } finally sh.unpersist(blocking = false)
  }

  private def containmentSweep(s: SparkSession, tag: String, d: String): String = {
    import s.implicits._
    // the AUTO-DERIVED cap (d16's one-agg pre-pass rule) joins the
    // sweep: the study asserts, every round, that the derived cap
    // reproduces the uncapped ground truth's reported pairs
    val maxDf = Dedup.shingleHashes(Tables.documents(s, d), $"doc_id", $"text")
      .groupBy($"sh").agg(count(lit(1)).as("df"))
      .agg(max($"df")).collect()(0).getLong(0)
    val derived = Dedup.containmentCap(maxDf).toInt
    val caps = (Seq(4, 8, 16, 64) :+ derived).distinct.sorted
    val rows = caps.map { cap =>
      val (nCand, nRes) = containmentAtCap(s, d, cap)
      val label = if (cap == derived) s"cap${cap}_derived" else s"cap$cap"
      s""""$label":{"count_filter_survivors":$nCand,"reported_pairs":$nRes}"""
    }
    s""""containment_cap_sweep_$tag":{"max_df":$maxDf,"derived_cap":$derived,${rows.mkString(",")}}"""
  }

  // ---- 3. IVM: maintain-from-feed vs recompute-from-snapshot ---------

  /** v22's cost claim, measured: a 1.5M-row versioned table (one row
    * per sf1 order, keyed by o_orderkey) serves a priority×month
    * rollup. A 1k-key correction merge lands; the view then refreshes
    * two ways — `VersionedTable.maintain` over the change feed vs a
    * full recompute over the new snapshot — asserted identical. The
    * feed is timed on BOTH of changes()' paths, because they are the
    * point: the batch's keys scatter over all 64 buckets, so the
    * DERIVED feed (owner-diff) rereads ~the whole table at each of 2
    * versions and loses to the recompute it is supposed to replace,
    * while the MATERIALIZED feed (the _cdc the merge wrote) reads 2k
    * rows however the keys scatter — the only refresh input that
    * stays merge-batch-sized at 100 TB. */
  private def ivmStudy(s: SparkSession, d: String): String = {
    import graft.sources.VersionedTable
    val dir = graft.util.Scratch.dir("study_ivm")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    val base = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
        expr("cast(date_format(o_orderdate, 'yyyy-MM') as string)").as("ym"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    VersionedTable.merge(s, dir, base, Seq("o_orderkey"))
    val tableRows = VersionedTable.read(s, dir).count()
    // the correction batch: 1k keys get a new price (moves sum, keeps
    // count), 100 of them change priority (moves rows across groups)
    val batch = VersionedTable.read(s, dir)
      .filter(col("o_orderkey") % 1500 === 7).limit(1000)
      .withColumn("cents", col("cents") + 12345L)
      .withColumn("prio",
        when(col("o_orderkey") % 15000 === 7, lit("0-RESTATED"))
          .otherwise(col("prio")))
    VersionedTable.merge(s, dir, batch, Seq("o_orderkey"))
    def rollup(df: DataFrame): DataFrame = df.groupBy(col("prio"), col("ym"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val view0 = rollup(VersionedTable.read(s, dir, Some(0L)))
      .persist()
    view0.count() // the standing view a warehouse already holds
    val (feedRows, feedSec) = time {
      VersionedTable.changes(s, dir, 0L, 1L).count()
    }
    val (_, feedDerivedSec) = time {
      VersionedTable.changes(s, dir, 0L, 1L, materialized = false).count()
    }
    val (maintained, maintainSec) = time {
      val r = VersionedTable.maintain(view0,
        VersionedTable.changes(s, dir, 0L, 1L),
        Seq("prio", "ym"), "n", Seq("cents"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      r
    }
    val (recomputed, recomputeSec) = time {
      rollup(VersionedTable.read(s, dir, Some(1L)))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
    }
    require(maintained == recomputed,
      "maintained view must equal the snapshot recompute bit-for-bit")
    view0.unpersist(blocking = false)
    s""""ivm_study_sf1":{"table_rows":$tableRows,"feed_rows":$feedRows,
       |"view_groups":${recomputed.size},"feed_scan_sec":${j(feedSec)},
       |"feed_scan_derived_sec":${j(feedDerivedSec)},
       |"maintain_sec":${j(maintainSec)},"recompute_sec":${j(recomputeSec)}}"""
      .stripMargin.replace("\n", "")
  }

  // ---- 4. filtered-ANN recall vs selectivity --------------------------

  /** Pre-filtered IVF vs pre-filtered exact, the s16 shape: the index
    * (cells = label, centroid = full-corpus cell mean) is built BEFORE
    * the filter — that is what makes selective filters dangerous, the
    * filter empties cells the index still routes probes into. */
  private def annFilterStudy(s: SparkSession, d: String): String = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
      .persist()
    e.count()
    val cent = e
      .select($"label".cast("long").as("label"), posexplode($"v").as(Seq("p", "x")))
      .groupBy($"label", $"p").agg(avg($"x").as("cx"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"p", $"cx"))),
        c => c.getField("cx")).as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
      .as[(Long, Seq[Double])].collect().toSeq
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val k = 10
    val sections = Seq(2L, 5L, 20L, 100L, 400L).map { m =>
      val corpus = e.filter($"vec_id" % m === 0 && $"vec_id" >= 10)
      val filtered = corpus
        .select($"vec_id".cast("long"), $"label".cast("long"), $"v")
        .as[(Long, Long, Seq[Double])]
        .collect().toSeq // study-sized driver set: <= |corpus|/m vectors
      val perProbe = probes.map { case (pid, pv) =>
        val exact = filtered.map { case (vid, _, v) => (vid, cos(pv, v)) }
          .sortBy { case (vid, c) => (-c, vid) }.take(k).map(_._1).toSet
        val cellRank = cent.toSeq
          .map { case (lbl, cv) => (lbl, cos(pv, cv)) }
          .sortBy { case (lbl, c) => (-c, lbl) }.map(_._1)
        val byProbe = Seq(1, 2, 4, 8).map { nprobe =>
          val cells = cellRank.take(nprobe).toSet
          val cands = filtered.filter { case (_, lbl, _) => cells(lbl) }
          val got = cands.map { case (vid, _, v) => (vid, cos(pv, v)) }
            .sortBy { case (vid, c) => (-c, vid) }.take(k).map(_._1).toSet
          val recall =
            if (exact.isEmpty) 1.0
            else got.intersect(exact).size.toDouble / exact.size
          (nprobe, recall, cands.size)
        }
        (byProbe, exact.size)
      }
      val survivors = filtered.size
      val byNprobe = Seq(1, 2, 4, 8).zipWithIndex.map { case (np, i) =>
        val rec = perProbe.map(_._1(i)._2).sum / perProbe.size
        val scanned = perProbe.map(_._1(i)._3).sum / perProbe.size
        s""""nprobe$np":{"recall_at_10":${j(rec)},"avg_scanned":$scanned}"""
      }
      s""""sel_1_in_$m":{"survivors":$survivors,${byNprobe.mkString(",")}}"""
    }
    e.unpersist(blocking = false)
    s""""ann_filter_study":{${sections.mkString(",")}}"""
  }

  // ---- 4. streaming state-store provider: heap vs RocksDB ----------

  /** Same stateful streaming job (complete-mode per-user hourly
    * counts over the staged events table, AvailableNow, multi-batch —
    * deliberately UNBOUNDED state, one entry per (user, hour) group,
    * the regime that separates the stores; a watermarked pipeline
    * whose state stays small never leaves the heap store's comfort
    * zone) under the default HDFS-backed (heap) state store and under
    * RocksDB — run twice each, interleaved, so neither pays the
    * one-off JVM/codegen warmup. Results are asserted identical;
    * recorded per provider: second-run wall, state rows, and the
    * provider's own memory figure. The decision this measures: the
    * heap store's per-commit version-map copy degrades with STATE
    * SIZE long before memory runs out, while RocksDB pays a flat
    * JNI/serialization toll — so the crossover arrives at a state
    * row count, not at heap exhaustion. */
  private def stateStoreStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = graft.util.Scratch.dir(s"study_ss_src_$tag")
    if (!new java.io.File(stage, "_SUCCESS").exists())
      Tables.events(s, d).repartition(8).write.mode("overwrite").parquet(stage)
    val schema = s.read.parquet(stage).schema
    def run(provider: String): (Set[(Long, Long, Long)], Double, Long, Long) = {
      val ns = s.newSession()
      ns.conf.set("spark.sql.shuffle.partitions", "8")
      ns.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      val name = s"ss_${provider.split('.').last}_${streamSeq.incrementAndGet()}"
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ss_ckpt").toString
      val agg = ns.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val t0 = System.nanoTime()
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = q.recentProgress.toSeq.flatMap(_.stateOperators)
        .filter(_.numRowsTotal > 0).lastOption
      val rows = ns.table(name)
        .select(unix_timestamp(col("window.start")).as("w"),
          col("user_id"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the study runs 8x per invocation and RocksDB checkpoints carry
      // full state snapshots — sweep each run's checkpoint tree
      graft.util.Scratch.deleteRecursively(new java.io.File(ckpt))
      (rows, sec,
        st.map(_.numRowsTotal).getOrElse(-1L),
        st.map(_.memoryUsedBytes).getOrElse(-1L))
    }
    val heapP = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val rocksP = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val (r1, _, _, _) = run(heapP)
    val (r2, _, _, _) = run(rocksP)
    val (r3, heapSec, heapRows, heapMem) = run(heapP)
    val (r4, rocksSec, rocksRows, rocksMem) = run(rocksP)
    require(r1 == r2 && r2 == r3 && r3 == r4,
      s"state-store providers disagree: heap=${r1.size} rocks=${r2.size} rows")
    s""""state_store_study_$tag":{"result_groups":${r1.size},
       |"heap":{"sec":${j(heapSec)},"state_rows":$heapRows,"mem_bytes":$heapMem},
       |"rocksdb":{"sec":${j(rocksSec)},"state_rows":$rocksRows,"mem_bytes":$rocksMem}}"""
      .stripMargin.replace("\n", "")
  }

  private val streamSeq = new java.util.concurrent.atomic.AtomicLong()

  // ---- 5. FileIndex scan vs union-of-scans on a many-commit table ---

  /** Quantifies what VersionedScan buys over the union-of-scans form it
    * replaced, on the shape that hurts the union: a table that has
    * accumulated many small merge commits (the steady state between
    * compactions). Builds a per-customer rollup table, applies 30
    * 20-key correction merges (measured: 13 dirs still own a bucket
    * after owner turnover, 64 live files), then times, warm,
    * second-of-two runs each:
    *   - full-table aggregate through the FileIndex (ONE FileSourceScan
    *     over ~94 files) vs through the union path (31 scan nodes);
    *   - a one-key point read through the index (pruned to ONE file by
    *     the key predicate) vs the union path (reads everything, then
    *     filters).
    * Also records the file/task counts behind the walls. The union
    * path is the engine's own former read() — kept as readBuckets for
    * the version-pinned internals — so this is a measured before/after,
    * not a strawman. */
  private def indexedScanStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.{col, count, lit, round, sum, year}
    val dir = graft.util.Scratch.dir(s"study_iscan_$tag")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    val ord = Tables.orders(s, d)
    val t0 = ord.filter(year(col("o_orderdate")) <= 1997)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"),
        count(lit(1)).as("n_orders"))
    graft.sources.VersionedTable.merge(s, dir, t0, Seq("o_custkey"))
    val keys = t0.select(col("o_custkey")).orderBy(col("o_custkey"))
      .limit(600).collect().map(_.getLong(0))
    keys.grouped(20).foreach { batch =>
      graft.sources.VersionedTable.merge(s, dir,
        t0.filter(col("o_custkey").isin(batch.map(Long.box).toIndexedSeq: _*))
          .withColumn("spend", col("spend") + 1.0),
        Seq("o_custkey"))
    }
    val sn = graft.sources.VersionedTable.snapshot(s, dir)
    val liveDirs = sn.owners.values.toSet.size
    def timed2(f: => Long): (Long, Double) = { time(f); time(f) }
    val (rows, idxFullSec) = timed2(
      graft.sources.VersionedTable.read(s, dir).count())
    val (rowsU, uniFullSec) = timed2(
      graft.sources.VersionedTable.readBuckets(s, dir, sn, None).count())
    require(rows == rowsU, s"index/union full reads disagree: $rows vs $rowsU")
    val probe = keys(300)
    val (one, idxPointSec) = timed2(
      graft.sources.VersionedTable.read(s, dir)
        .filter(col("o_custkey") === probe).count())
    val (oneU, uniPointSec) = timed2(
      graft.sources.VersionedTable.readBuckets(s, dir, sn, None)
        .filter(col("o_custkey") === probe).count())
    require(one == 1L && oneU == 1L, s"point reads disagree: $one vs $oneU")
    val totalFiles = sn.owners.keys.toSeq.map { b =>
      new java.io.File(s"$dir/${sn.owners(b)}/kb=$b")
        .listFiles().count(f => f.getName.endsWith(".parquet"))
    }.sum
    s""""indexed_scan_study_$tag":{"rows":$rows,"live_commit_dirs":$liveDirs,
       |"total_files":$totalFiles,
       |"full_index_sec":${j(idxFullSec)},"full_union_sec":${j(uniFullSec)},
       |"point_index_sec":${j(idxPointSec)},"point_union_sec":${j(uniPointSec)}}"""
      .stripMargin.replace("\n", "")
  }

  // ---- 6. COW write amplification vs merge-on-read (round-10 item 3)

  private def dirBytes(root: java.io.File, excludeCdc: Boolean = true): Long = {
    if (!root.exists()) 0L
    else if (root.isFile) root.length()
    else if (excludeCdc && root.getName == "_cdc") 0L
    else Option(root.listFiles()).map(_.map(dirBytes(_, excludeCdc)).sum).getOrElse(0L)
  }

  /** The write-side amplification question the ivm_study left open: a
    * 0.1%-key batch scattered UNIFORMLY over all 64 buckets — COW
    * rewrites every touched bucket (≈ the whole table), MoR writes the
    * batch. Records bytes-rewritten / bytes-logically-changed for both
    * modes, plus the read-side price MoR pays until compaction (the
    * resolved read vs the folded read, warm second-of-two runs). The
    * measured ratio is what `merge(mor = true)`'s scaladoc rule rests
    * on. */
  private def cowAmplificationStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.{col, count, lit, pmod, round, sum, xxhash64, year}
    def freshTable(name: String): String = {
      val dir = graft.util.Scratch.dir(s"study_cow_${tag}_$name")
      graft.util.Scratch.deleteRecursively(new java.io.File(dir))
      dir
    }
    val ord = Tables.orders(s, d)
    val t0 = ord.filter(year(col("o_orderdate")) <= 1997)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"),
        count(lit(1)).as("n_orders"))
      .persist()
    val tableRows = t0.count()
    // ~0.1% of keys, scattered by the key hash itself — the uniform
    // worst case for bucket-granular COW
    val batch = t0.filter(pmod(xxhash64(col("o_custkey")), lit(997L)) === 0)
      .withColumn("spend", round(col("spend") + 1.0, 2))
    val batchRows = batch.count()
    val batchScratch = freshTable("batch")
    batch.coalesce(1).write.mode("overwrite").parquet(batchScratch)
    val batchBytes = dirBytes(new java.io.File(batchScratch))
    // COW
    val cowDir = freshTable("cow")
    graft.sources.VersionedTable.merge(s, cowDir, t0, Seq("o_custkey"))
    val snBefore = graft.sources.VersionedTable.snapshot(s, cowDir)
    val tableBytes = dirBytes(new java.io.File(cowDir))
    val (_, cowMergeSec) = time(
      graft.sources.VersionedTable.merge(s, cowDir, batch, Seq("o_custkey")))
    val snAfter = graft.sources.VersionedTable.snapshot(s, cowDir)
    val cowNewDirs = snAfter.owners.values.toSet -- snBefore.owners.values.toSet
    val cowRewritten = cowNewDirs.toSeq
      .map(dn => dirBytes(new java.io.File(s"$cowDir/$dn"))).sum
    val cowTouched = snAfter.owners
      .count { case (b, dn) => snBefore.owners.get(b) != Some(dn) }
    def timed2(f: => Long): (Long, Double) = { time(f); time(f) }
    val (cowRows, cowReadSec) = timed2(
      graft.sources.VersionedTable.read(s, cowDir).count())
    // MoR
    val morDir = freshTable("mor")
    graft.sources.VersionedTable.merge(s, morDir, t0, Seq("o_custkey"))
    val (_, morMergeSec) = time(graft.sources.VersionedTable.merge(
      s, morDir, batch, Seq("o_custkey"), mor = true))
    val snMor = graft.sources.VersionedTable.snapshot(s, morDir)
    val morWritten = snMor.deltaDirs.toSeq
      .map(dn => dirBytes(new java.io.File(s"$morDir/$dn"))).sum
    val (morRows, morReadSec) = timed2(
      graft.sources.VersionedTable.read(s, morDir).count())
    require(morRows == cowRows, s"MoR/COW row counts diverge: $morRows vs $cowRows")
    val (_, compactSec) = time(graft.sources.VersionedTable.compact(s, morDir))
    val (_, foldedReadSec) = timed2(
      graft.sources.VersionedTable.read(s, morDir).count())
    t0.unpersist(blocking = false)
    s""""cow_write_amplification_$tag":{"table_rows":$tableRows,
       |"table_bytes":$tableBytes,"batch_rows":$batchRows,
       |"batch_bytes":$batchBytes,
       |"cow_rewritten_bytes":$cowRewritten,
       |"cow_amplification":${j(cowRewritten.toDouble / batchBytes)},
       |"cow_buckets_touched":$cowTouched,"cow_merge_sec":${j(cowMergeSec)},
       |"mor_written_bytes":$morWritten,
       |"mor_amplification":${j(morWritten.toDouble / batchBytes)},
       |"mor_merge_sec":${j(morMergeSec)},
       |"cow_read_sec":${j(cowReadSec)},"mor_resolved_read_sec":${j(morReadSec)},
       |"compact_sec":${j(compactSec)},"folded_read_sec":${j(foldedReadSec)}}"""
      .stripMargin.replace("\n", "")
  }

  /** MoR read-cost vs LIVE LAYER COUNT — the number the compaction
    * cadence hangs off. Stacks k scattered delta merges (k = 1, 4, 8,
    * 16) on copies of the same base table and times the resolved full
    * read (warm, second-of-two) plus a 1-key lookup at each depth,
    * with the folded (post-compact) read as the floor. */
  private def morLayersStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.{col, count, lit, pmod, round, sum, xxhash64, year}
    val ord = Tables.orders(s, d)
    val t0 = ord.filter(year(col("o_orderdate")) <= 1997)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"),
        count(lit(1)).as("n_orders"))
      .persist()
    t0.count()
    val probe = t0.select(col("o_custkey")).orderBy(col("o_custkey"))
      .limit(1).collect()(0).getLong(0)
    def timed2(f: => Long): (Long, Double) = { time(f); time(f) }
    val sections = Seq(1, 4, 8, 16).map { k =>
      val dir = graft.util.Scratch.dir(s"study_morlayers_${tag}_$k")
      graft.util.Scratch.deleteRecursively(new java.io.File(dir))
      graft.sources.VersionedTable.merge(s, dir, t0, Seq("o_custkey"))
      (1 to k).foreach { i =>
        val batch = t0
          .filter(pmod(xxhash64(col("o_custkey")), lit(997L)) === (i % 997))
          .withColumn("spend", round(col("spend") + i, 2))
        graft.sources.VersionedTable.merge(s, dir, batch, Seq("o_custkey"),
          mor = true)
      }
      val (layers, maxPer, dBytes) =
        graft.sources.VersionedTable.deltaStats(s, dir)
      val (_, readSec) = timed2(
        graft.sources.VersionedTable.read(s, dir).count())
      val keys = s.createDataFrame(Seq(Tuple1(probe))).toDF("o_custkey")
      val (_, lookupSec) = timed2(
        graft.sources.VersionedTable.lookup(s, dir, keys).count())
      graft.sources.VersionedTable.compact(s, dir)
      val (_, foldedSec) = timed2(
        graft.sources.VersionedTable.read(s, dir).count())
      s""""layers_$k":{"live_layers":$layers,"max_per_bucket":$maxPer,
         |"delta_bytes":$dBytes,"read_sec":${j(readSec)},
         |"lookup_sec":${j(lookupSec)},"folded_read_sec":${j(foldedSec)}}"""
        .stripMargin.replace("\n", "")
    }
    t0.unpersist(blocking = false)
    s""""mor_layers_$tag":{${sections.mkString(",")}}"""
  }

  /** Round-12: the idempotent-writer ledger's operational value,
    * measured. A streaming sink recovering from a checkpoint
    * re-delivers its last micro-batch; by upsert semantics a replay is
    * CORRECT either way, so the ledger's value is pure operations —
    * without `txn` every replay is a full merge commit (a version, a
    * delta layer, the commit's write+publish work), with it a replay
    * is one manifest read. 20 scattered MoR batches each delivered
    * twice against twin tables; records the replay-path wall and the
    * version/layer/read-cost bills each arm accumulates. */
  private def txnReplayStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.{col, count, lit, pmod, round, sum, xxhash64, year}
    val batchesN = 20
    val ord = Tables.orders(s, d)
    val t0 = ord.filter(year(col("o_orderdate")) <= 1997)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"),
        count(lit(1)).as("n_orders"))
      .persist()
    t0.count()
    def batch(i: Int) = t0
      .filter(pmod(xxhash64(col("o_custkey")), lit(499L)) === (i % 499))
      .withColumn("spend", round(col("spend") + i, 2))
    def arm(useTxn: Boolean): (Double, Long, Int, Double) = {
      val dir = graft.util.Scratch.dir(s"study_txn_${tag}_$useTxn")
      graft.util.Scratch.deleteRecursively(new java.io.File(dir))
      graft.sources.VersionedTable.merge(s, dir, t0, Seq("o_custkey"))
      def deliver(i: Int): Long =
        graft.sources.VersionedTable.merge(s, dir, batch(i),
          Seq("o_custkey"), mor = true,
          txn = if (useTxn) Some(("study_ingest", i.toLong)) else None)
      (0 until batchesN).foreach(deliver)
      // the replay pass: what checkpoint recovery re-delivers
      val (_, replayWall) = time((0 until batchesN).foreach(deliver))
      val versions = graft.sources.VersionedTable.versions(s, dir).max
      val layers = graft.sources.VersionedTable.deltaStats(s, dir)._1
      val (_, readSec) = { time(
        graft.sources.VersionedTable.read(s, dir).count())
        time(graft.sources.VersionedTable.read(s, dir).count()) }
      (replayWall, versions, layers, readSec)
    }
    val (wSkip, vSkip, lSkip, rSkip) = arm(useTxn = true)
    val (wDup, vDup, lDup, rDup) = arm(useTxn = false)
    t0.unpersist(blocking = false)
    s""""txn_replay_$tag":{"batches":$batchesN,
       |"replay_wall_sec_txn":${j(wSkip)},"replay_wall_sec_untagged":${j(wDup)},
       |"versions_txn":$vSkip,"versions_untagged":$vDup,
       |"live_layers_txn":$lSkip,"live_layers_untagged":$lDup,
       |"resolved_read_sec_txn":${j(rSkip)},"resolved_read_sec_untagged":${j(rDup)}}"""
      .stripMargin.replace("\n", "")
  }

  /** Round-12: what file-level data skipping buys over parquet
    * row-group pushdown alone, on the chunked-compact layout. Same
    * table, same quarter-range scan, chunksPerBucket 1 (stats exist
    * but every bucket is one full-range file — skipping CAN'T prune)
    * vs 8 (range-disjoint chunks — the FileIndex drops non-matching
    * files before any task launches). Records files read (executed-
    * plan numFiles) and second-run walls; at 100 TB the pruned files
    * are also footer reads and scheduler tasks that never happen. */
  private def dataSkippingStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.{col, lit}
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    def arm(chunks: Int): (Long, Long, Double) = {
      val dir = graft.util.Scratch.dir(s"study_skip_${tag}_$chunks")
      graft.util.Scratch.deleteRecursively(new java.io.File(dir))
      graft.sources.VersionedTable.merge(s, dir, ord, Seq("o_orderkey"),
        numBuckets = 16)
      graft.sources.VersionedTable.compact(s, dir,
        clusterBy = Seq("o_orderdate"), chunksPerBucket = chunks)
      def ranged = graft.sources.VersionedTable.read(s, dir)
        .filter(col("o_orderdate") >=
            lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          col("o_orderdate") <
            lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00")))
        .select(col("o_orderkey"))
      val total = graft.util.PlanMetrics.filesRead(
        graft.sources.VersionedTable.read(s, dir).select(col("o_orderkey")))
      val read = graft.util.PlanMetrics.filesRead(ranged)
      val (_, wall) = { time(ranged.count()); time(ranged.count()) }
      (total, read, wall)
    }
    val (t1, r1, w1) = arm(1)
    val (t8, r8, w8) = arm(8)
    // two-dimensional arm: (o_orderdate, o_totalprice) clusterBy,
    // lexicographic vs Morton z-order, probing the TRAILING column —
    // the case lexicographic chunking cannot prune at all
    def arm2(z: Boolean): (Long, Long) = {
      val dir = graft.util.Scratch.dir(s"study_skip2_${tag}_$z")
      graft.util.Scratch.deleteRecursively(new java.io.File(dir))
      graft.sources.VersionedTable.merge(s, dir, ord, Seq("o_orderkey"),
        numBuckets = 16)
      graft.sources.VersionedTable.compact(s, dir,
        clusterBy = Seq("o_orderdate", "o_totalprice"),
        chunksPerBucket = 8, zorder = z)
      val probe = graft.sources.VersionedTable.read(s, dir)
        .filter(col("o_totalprice") >= 400000.0)
        .select(col("o_orderkey"))
      (graft.util.PlanMetrics.filesRead(
        graft.sources.VersionedTable.read(s, dir).select(col("o_orderkey"))),
        graft.util.PlanMetrics.filesRead(probe))
    }
    val (lexTotal, lexRead) = arm2(z = false)
    val (zTotal, zRead) = arm2(z = true)
    s""""data_skipping_$tag":{
       |"chunks_1":{"files_total":$t1,"files_read":$r1,"scan_sec":${j(w1)}},
       |"chunks_8":{"files_total":$t8,"files_read":$r8,"scan_sec":${j(w8)}},
       |"trailing_col_lex":{"files_total":$lexTotal,"files_read":$lexRead},
       |"trailing_col_zorder":{"files_total":$zTotal,"files_read":$zRead}}"""
      .stripMargin.replace("\n", "")
  }

  // ---- 7. OCC throughput under contention (round-10 item 6) ---------

  /** The four-writer spec proves OCC safety; this measures THROUGHPUT:
    * N threads × M merges on (a) bucket-DISJOINT key sets — losers
    * rebase, no recompute — and (b) OVERLAPPING buckets — losers pay
    * the bounded recompute-retry. Records commits/sec, rebase count,
    * and recompute count per scenario; the scaladoc's operating rule
    * (pre-partition parallel writers by bucket) is the conclusion. */
  private def occThroughputStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.{col, count, lit, pmod, round, sum, xxhash64, year}
    val threadsN = 4
    val mergesM = 5
    val ord = Tables.orders(s, d)
    val t0 = ord.filter(year(col("o_orderdate")) <= 1997)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"),
        count(lit(1)).as("n_orders"))
      .persist()
    t0.count()
    val bucketCol = pmod(xxhash64(col("o_custkey")), lit(64L)).cast("int")
    def scenario(name: String, bucketsFor: Int => Seq[Int]): String = {
      val dir = graft.util.Scratch.dir(s"study_occ_${tag}_$name")
      graft.util.Scratch.deleteRecursively(new java.io.File(dir))
      graft.sources.VersionedTable.merge(s, dir, t0, Seq("o_custkey"))
      graft.sources.VersionedTable.conflictRecomputes.set(0)
      graft.sources.VersionedTable.rebaseRetries.set(0)
      val failures = new java.util.concurrent.atomic.AtomicLong
      val t0n = System.nanoTime()
      val threads = (0 until threadsN).map { ti =>
        new Thread(() => {
          (0 until mergesM).foreach { mi =>
            val bs = bucketsFor(ti)
            val batch = t0
              .filter(bucketCol.isin(bs.map(Int.box): _*))
              .withColumn("spend", round(col("spend") + lit(ti * 100 + mi + 1), 2))
            try graft.sources.VersionedTable.merge(s, dir, batch,
              Seq("o_custkey"), maxConflictRetries = 16)
            catch { case _: Throwable => failures.incrementAndGet() }
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0n) / 1e9
      val commits = threadsN.toLong * mergesM - failures.get()
      s""""$name":{"threads":$threadsN,"merges_per_thread":$mergesM,
         |"wall_sec":${j(wall)},"commits":$commits,
         |"commits_per_sec":${j(commits / wall)},
         |"rebases":${graft.sources.VersionedTable.rebaseRetries.get()},
         |"recomputes":${graft.sources.VersionedTable.conflictRecomputes.get()},
         |"failed":${failures.get()}}""".stripMargin.replace("\n", "")
    }
    // disjoint: thread i owns buckets ≡ i (mod N) — losers only rebase
    val disjoint = scenario("disjoint_buckets",
      ti => (0 until 64).filter(_ % threadsN == ti))
    // overlapping: every thread hits the same 16 buckets — true
    // conflicts, bounded recompute-retry pays for serialization
    val overlap = scenario("overlapping_buckets", _ => 0 until 16)
    t0.unpersist(blocking = false)
    s""""occ_throughput_$tag":{$disjoint,$overlap}"""
  }

  /** Round-13 brief item 1: is commit-time stats collection flat in
    * file count now that footer reads run distributed? Same table,
    * chunked compacts producing 8 / 64 / 256 stat'd files; re-times
    * the exact collection path a commit runs (collectStatsFor) on each
    * committed dir. 8 files ride the driver loop (below the 16-file
    * cutover), the rest the distributed job — wall per FILE must fall,
    * not hold, as file count grows (the driver-serial loop held it
    * constant: Θ(files) sequential footer RPCs). */
  private def statsCostStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.col
    val ord = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    def arm(chunks: Int): (Long, Double) = {
      val dir = graft.util.Scratch.dir(s"study_statscost_${tag}_$chunks")
      graft.util.Scratch.deleteRecursively(new java.io.File(dir))
      graft.sources.VersionedTable.merge(s, dir, ord, Seq("o_orderkey"),
        numBuckets = 8)
      graft.sources.VersionedTable.compact(s, dir,
        clusterBy = Seq("o_orderdate"), chunksPerBucket = chunks)
      val sn = graft.sources.VersionedTable.snapshot(s, dir)
      val commitDir = sn.owners.values.head
      val files = sn.fileStats.size.toLong
      // warm once (JIT + FS metadata cache), then time the real pass
      graft.sources.VersionedTable.collectStatsFor(s, dir, commitDir,
        Seq("o_orderdate"))
      val (_, w) = time(graft.sources.VersionedTable.collectStatsFor(
        s, dir, commitDir, Seq("o_orderdate")))
      (files, w)
    }
    val (f1, w1) = arm(1)
    val (f8, w8) = arm(8)
    val (f32, w32) = arm(32)
    s""""stats_commit_cost_$tag":{"driver_cutover_files":${
      graft.sources.VersionedTable.statsDriverMaxFiles},
       |"files_a":$f1,"wall_sec_a":${j(w1)},
       |"files_b":$f8,"wall_sec_b":${j(w8)},
       |"files_c":$f32,"wall_sec_c":${j(w32)},
       |"usec_per_file_a":${j(w1 * 1e6 / math.max(1, f1))},
       |"usec_per_file_b":${j(w8 * 1e6 / math.max(1, f8))},
       |"usec_per_file_c":${j(w32 * 1e6 / math.max(1, f32))}}"""
      .stripMargin.replace("\n", "")
  }

  /** Round-13 brief item 5: attribute e27's r12 quiet-to-quiet CPU
    * growth (+18% at identical stage counts). Hypothesis from the
    * verdict: the merge path's per-batch txn-ledger probe + deltaStats
    * listing added work; round 13's manifest-carried delta bytes
    * should remove the listing term. The probe isolates the
    * compaction-cadence probe itself on a 20-layer MoR table: the
    * MANIFEST path (what deltaStats now runs) vs the LISTING path
    * (what r12 ran — one getContentSummary per live (layer, bucket)
    * pair, reproduced verbatim), each timed over 50 calls. The
    * difference × probes-per-batch is the per-batch work item 2
    * removed. */
  private def e27ProbeStudy(s: SparkSession, tag: String, d: String): String = {
    import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit}
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
    val dir = graft.util.Scratch.dir(s"study_e27probe_$tag")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    graft.sources.VersionedTable.merge(s, dir, ord, Seq("o_orderkey"),
      numBuckets = 8)
    val layersN = 20
    (0 until layersN).foreach { i =>
      graft.sources.VersionedTable.merge(s, dir,
        ord.filter(pmod(xxhash64(col("o_orderkey")), lit(97L)) === i),
        Seq("o_orderkey"), numBuckets = 8, mor = true)
    }
    val sn = graft.sources.VersionedTable.snapshot(s, dir)
    val reps = 50
    // manifest path: the probe as shipped
    val (_, wManifest) = time((0 until reps).foreach(_ =>
      graft.sources.VersionedTable.deltaStats(s, dir)))
    // listing path: r12's implementation, reproduced on the same state
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val livePairs = sn.deltas.toSeq.flatMap { case (b, ds) =>
      ds.map(dd => s"$dd/kb=$b")
    }
    val (_, wListing) = time((0 until reps).foreach { _ =>
      livePairs.foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(root, p)
        if (fs.exists(hp)) fs.getContentSummary(hp).getLength
      }
    })
    s""""e27_merge_probe_$tag":{"layers":${sn.deltaDirs.size},
       |"live_pairs":${livePairs.size},"probe_reps":$reps,
       |"delta_stats_manifest_ms_per_call":${j(wManifest * 1000 / reps)},
       |"delta_stats_listing_ms_per_call":${j(wListing * 1000 / reps)},
       |"listing_removed_ratio":${j(wListing / math.max(1e-9, wManifest))}}"""
      .stripMargin.replace("\n", "")
  }

  // ---- manifest/history scale: snapshot & sweep cost vs commit count

  /** Does snapshot load stay flat at 10⁴ commits, and what does the
    * publish sweep cost against a long feed-less history? The table is
    * real (8 commits); depth is then fabricated by cloning the head
    * manifest with bumped version numbers — valid manifests whose
    * owners point at the real files, so `snapshot`/`history` parse
    * exactly what a long-lived table's log holds, without paying 10⁴
    * Spark write jobs to measure an FS-layer cost. `sweep_cold` is the
    * pre-watermark behavior (marker deleted: the sweep re-opens every
    * feed-less manifest); `sweep_warm` is the post-watermark steady
    * state every commit actually pays. */
  private def manifestScaleStudy(s: SparkSession): String = {
    import s.implicits._
    val dir = graft.util.Scratch.dir("study_manifest_scale")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    (0 until 8).foreach { i =>
      graft.sources.VersionedTable.merge(s, dir,
        Seq((i.toLong, s"v$i")).toDF("k", "v"), Seq("k"), numBuckets = 4)
    }
    val log = java.nio.file.Paths.get(dir, "_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val head = mapper.readTree(java.nio.file.Files.readAllBytes(
        log.resolve("00000007.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    head.remove("cdcDir"); head.remove("cdcSchema")
    var fabricated = 8
    def fabricate(upTo: Int): Unit = {
      (fabricated until upTo).foreach { v =>
        head.put("version", v.toLong)
        java.nio.file.Files.write(log.resolve(f"$v%08d.json"),
          mapper.writeValueAsBytes(head))
      }
      fabricated = math.max(fabricated, upTo)
    }
    val wm = java.nio.file.Paths.get(dir, "_feed", "_swept")
    val entries = Seq(128, 1024, 10240).map { n =>
      fabricate(n)
      java.nio.file.Files.deleteIfExists(wm)
      val (_, coldSweep) = time(graft.sources.VersionedTable.publishFeeds(s, dir))
      val (_, warmSweep) = time(graft.sources.VersionedTable.publishFeeds(s, dir))
      val (vs, tVers) = time(graft.sources.VersionedTable.versions(s, dir))
      val (_, tSnap) = time(graft.sources.VersionedTable.snapshot(s, dir))
      // history() is O(commits) manifest reads BY CONTRACT (it reports
      // every version); measured to document the slope users pay
      val (_, tHist) =
        if (n <= 1024) time(graft.sources.VersionedTable.history(s, dir).count())
        else (0L, -1.0)
      s""""commits_$n":{"versions_sec":${j(tVers)},"snapshot_sec":${j(tSnap)},
         |"sweep_cold_sec":${j(coldSweep)},"sweep_warm_sec":${j(warmSweep)},
         |"history_sec":${j(tHist)},"n_listed":${vs.size}}"""
        .stripMargin.replace("\n", "")
    }
    // a real merge at full depth: the end-to-end commit cost including
    // listing, snapshot load, and the (watermarked) sweep
    val (_, tMerge) = time(graft.sources.VersionedTable.merge(s, dir,
      Seq((999L, "deep")).toDF("k", "v"), Seq("k"), numBuckets = 4))
    s""""manifest_scale":{${entries.mkString(",")},
       |"merge_at_10k_sec":${j(tMerge)}}""".stripMargin.replace("\n", "")
  }

  // ---- round-15: per-batch named-sink cost vs table history depth

  /** The r14 `weak` item, measured end-to-end: the named streaming
    * sink commits one version per micro-batch, so its own uptime
    * deepens the history its per-batch probes read. Pre-r15, addBatch
    * paid two O(commits) `_log` listings (exists + layout probe) plus
    * the sweep's `_log` and `_feed` listings — ~0.3-0.4 s of driver
    * time per batch at 10,240 commits and rising linearly. Post-r15
    * every per-batch term resolves through the `_head` hint and the
    * sink's across-batch layout cache; this study drives REAL
    * `addBatch` calls at depth ~16 and at depth 10,240 and reports the
    * per-batch wall — flat ⇒ the fix holds. Also measured here:
    * `latestVersion`/`snapshot`/warm-sweep at depth (the individual
    * per-batch terms), and `history()` at 10,240 — the r14 `-1.0`
    * sentinel finished: history is O(commits) manifest reads BY
    * CONTRACT (one row per self-contained manifest), so the number
    * documents the slope users pay, not a defect. */
  private def sinkDepthStudy(s: SparkSession): String = {
    import s.implicits._
    val dir = graft.util.Scratch.dir("study_sink_depth")
    graft.util.Scratch.deleteRecursively(new java.io.File(dir))
    val sink = new graft.sources.GraftStreamSink(s, dir,
      Map("keycols" -> "k", "numbuckets" -> "4"),
      explicitAppId = Some("study_sink"), checkpointLoc = None)
    def batch(i: Long) = Seq((i % 16, s"b$i")).toDF("k", "v")
    def perBatch(from: Long, n: Int): Double = {
      val (_, w) = time(
        (from until from + n).foreach(i => sink.addBatch(i, batch(i))))
      w / n
    }
    perBatch(0L, 8)                      // JVM/codegen warmup commits
    val shallowPer = perBatch(8L, 8)     // steady per-batch at depth ~16
    val (_, tLatestShallow) =
      time(graft.sources.VersionedTable.latestVersion(s, dir))
    val (_, tSnapShallow) =
      time(graft.sources.VersionedTable.snapshot(s, dir))
    // fabricate depth: clone the head manifest with bumped versions
    // (valid manifests over the same data files — the FS-layer cost is
    // what depth changes), strip cdc so the clones are feed-less, and
    // advance the head hint exactly as real commits would have
    val log = java.nio.file.Paths.get(dir, "_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val head = mapper.readTree(java.nio.file.Files.readAllBytes(
        log.resolve("00000015.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    head.remove("cdcDir"); head.remove("cdcSchema")
    (16 until 10240).foreach { v =>
      head.put("version", v.toLong)
      java.nio.file.Files.write(log.resolve(f"$v%08d.json"),
        mapper.writeValueAsBytes(head))
    }
    java.nio.file.Files.write(log.resolve("_head"),
      "10239".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(log.resolve("._head.crc"))
    // one catch-up batch: the sweep walks the fabricated (wm, head]
    // range ONCE (real operation sweeps per commit, so the gap never
    // exceeds the batch cadence) — excluded from the steady window
    val (_, catchup) = time(sink.addBatch(10240L, batch(10240L)))
    val deepPer = perBatch(10241L, 8)    // steady per-batch at depth 10k
    val (_, tLatestDeep) =
      time(graft.sources.VersionedTable.latestVersion(s, dir))
    val (_, tSnapDeep) =
      time(graft.sources.VersionedTable.snapshot(s, dir))
    val (_, tSweepDeep) =
      time(graft.sources.VersionedTable.publishFeeds(s, dir))
    val (nHist, tHist) =
      time(graft.sources.VersionedTable.history(s, dir).count())
    s""""sink_depth":{"shallow_per_batch_sec":${j(shallowPer)},
       |"deep_per_batch_sec":${j(deepPer)},
       |"deep_over_shallow":${j(deepPer / math.max(1e-9, shallowPer))},
       |"catchup_batch_sec":${j(catchup)},
       |"latest_version_shallow_sec":${j(tLatestShallow)},
       |"latest_version_10k_sec":${j(tLatestDeep)},
       |"snapshot_shallow_sec":${j(tSnapShallow)},
       |"snapshot_10k_sec":${j(tSnapDeep)},
       |"sweep_warm_10k_sec":${j(tSweepDeep)},
       |"history_10240_sec":${j(tHist)},"history_rows":$nHist}"""
      .stripMargin.replace("\n", "")
  }

  // ---- round-15: stored-index serving vs per-query retraining

  /** What the durable index BUYS: s03's inline IVF re-derives the
    * centroids from the corpus on every query; s17/s18 serve from the
    * persisted artifact. This times a build ONCE, then N repeated
    * lookups through each path on the same corpus.
    *
    * MEASURED NEGATIVE RESULT at sf0.1 (study_r15.json
    * `stored_index`): serve ≈ retrain (0.91 s both) — at 60k×64-dim
    * the per-query wall is FIXED JOB OVERHEAD (stage launch, broadcast
    * build), not the centroid aggregate, and the 13 s build only pays
    * off after many queries. The honest operating rule: at small SF
    * the artifact buys VERSIONING (pinned serving, auditable retrains,
    * no float-order drift between query and oracle), not latency; the
    * latency argument is structural and kicks in when the corpus scan
    * dominates the fixed overhead — the retrain is a FULL corpus
    * aggregate while the stored path reads |cells| centroid rows plus
    * the probed cells' rows, a gap that grows linearly with corpus
    * size. */
  private def storedIndexStudy(s: SparkSession, d: String): String = {
    import s.implicits._
    val reps = 5
    val (path, tBuild) = time(graft.ext.Similarity.ensureIvfIndex(s, d))
    def probesDf = graft.sources.VersionedTable.read(s, path)
      .filter($"part" === "code" && $"id" < 10)
      .select($"id".as("probe_id"), $"vec".as("pv"))
    val (_, tServe) = time((0 until reps).foreach { _ =>
      graft.ext.Similarity.ivfIndexSearch(s, path, probesDf, 3, 2).count()
    })
    val (_, tInline) = time((0 until reps).foreach { _ =>
      graft.ext.Similarity.queries("s03_ivf_ann")(s, d).count()
    })
    s""""stored_index":{"build_once_sec":${j(tBuild)},
       |"serve_per_query_sec":${j(tServe / reps)},
       |"inline_retrain_per_query_sec":${j(tInline / reps)},
       |"serve_speedup":${j(tInline / math.max(1e-9, tServe))},
       |"reps":$reps}""".stripMargin.replace("\n", "")
  }

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("only="))
    val sf01 = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = if (pos.length > 1) Some(pos(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional 3rd arg `only=a,b` reruns just the named studies; their
    // sections REPLACE the matching keys in an existing study_r9.json
    // and every other previously measured section is kept verbatim —
    // adding a study never silently re-times the older ones
    val only = args.find(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(",").toSet)
    def want(name: String) = only.forall(_.contains(name))
    val parts = Seq.newBuilder[String]   // round-9 studies → study_r9.json
    val parts10 = Seq.newBuilder[String] // round-10-brief studies → study_r10.json
    val parts11 = Seq.newBuilder[String] // round-11-brief studies → study_r11.json
    val parts12 = Seq.newBuilder[String] // round-12 studies → study_r12.json
    val parts13 = Seq.newBuilder[String] // round-13 studies → study_r13.json
    val parts14 = Seq.newBuilder[String] // round-14 studies → study_r14.json
    val parts15 = Seq.newBuilder[String] // round-15 studies → study_r15.json
    if (want("containment")) parts += containmentSweep(spark, "sf01", sf01)
    if (want("ann")) parts += annFilterStudy(spark, sf01)
    if (want("statestore")) parts += stateStoreStudy(spark, "sf01", sf01)
    if (want("iscan")) parts += indexedScanStudy(spark, "sf01", sf01)
    if (want("cow")) parts10 += cowAmplificationStudy(spark, "sf01", sf01)
    if (want("occ")) parts10 += occThroughputStudy(spark, "sf01", sf01)
    if (want("morlayers")) parts10 += morLayersStudy(spark, "sf01", sf01)
    if (want("txnreplay")) parts12 += txnReplayStudy(spark, "sf01", sf01)
    if (want("skipping")) parts12 += dataSkippingStudy(spark, "sf01", sf01)
    if (want("statscost")) parts13 += statsCostStudy(spark, "sf01", sf01)
    if (want("e27probe")) parts13 += e27ProbeStudy(spark, "sf01", sf01)
    if (want("manifestscale")) parts14 += manifestScaleStudy(spark)
    if (want("sinkdepth")) parts15 += sinkDepthStudy(spark)
    if (want("storedindex")) parts15 += storedIndexStudy(spark, sf01)
    sf1.foreach { d =>
      if (want("containment")) parts += containmentSweep(spark, "sf1", d)
      if (want("skew")) parts += skewStudy(spark, d)
      if (want("ivm")) parts += ivmStudy(spark, d)
      if (want("statestore")) parts += stateStoreStudy(spark, "sf1", d)
      if (want("iscan")) parts += indexedScanStudy(spark, "sf1", d)
      if (want("cow")) parts10 += cowAmplificationStudy(spark, "sf1", d)
      // round-11 brief item 8: does the layer-count-not-bytes read-cost
      // law hold at 10× the data? (gate name "morlayers1" so re-running
      // it never re-times the recorded sf0.1 section)
      if (want("morlayers1")) parts11 += morLayersStudy(spark, "sf1", d)
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def writeMerged(file: String, sections: Seq[String]): Unit = {
      if (sections.isEmpty) return
      val out = java.nio.file.Paths.get(file)
      val merged = mapper.createObjectNode()
      if (java.nio.file.Files.exists(out))
        merged.setAll(mapper.readTree(java.nio.file.Files.readAllBytes(out))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
      merged.setAll(mapper.readTree(s"{${sections.mkString(",")}}")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
      val json = mapper.writeValueAsString(merged)
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
      println(json)
    }
    writeMerged("study_r9.json", parts.result())
    writeMerged("study_r10.json", parts10.result())
    writeMerged("study_r11.json", parts11.result())
    writeMerged("study_r12.json", parts12.result())
    writeMerged("study_r13.json", parts13.result())
    writeMerged("study_r14.json", parts14.result())
    writeMerged("study_r15.json", parts15.result())
    spark.stop()
  }
}
