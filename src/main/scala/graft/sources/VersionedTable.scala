package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** A minimal versioned copy-on-write table on parquet: `mergeParquet`'s
  * key-scoped MERGE (Sources.scala) generalized from "one durable
  * state" to an append-only MANIFEST LOG with snapshot (time-travel)
  * reads and vacuum — the durability contract the reference's
  * update-then-insert load (mainTesting.py:130-149, 693-761) implies,
  * completed with the audit/rollback half that a real warehouse needs.
  *
  * Layout:
  * {{{
  *   table/
  *     _log/00000000.json     one manifest per committed version
  *     d00000000_ab12cd34/    immutable commit dir, kb=<bucket>/part-*
  *     d00000001_9f00e1c2/
  * }}}
  *
  * Every data directory is written exactly once and never modified; a
  * manifest maps each key-hash bucket (`kb = pmod(xxhash64(keys), B)`,
  * the same bucketing as `mergeParquet`) to the ONE commit dir that
  * owns its current rows. A merge therefore:
  *   1. reads only the affected buckets (manifest-driven file pruning
  *      plus kb partition pruning inside each commit dir),
  *   2. writes survivors ∪ upserts for those buckets to a NEW dir,
  *   3. commits a manifest whose owner map points the affected buckets
  *      at the new dir and every other bucket wherever it already was.
  * A merge of a 1k-row batch into a 100 TB table moves ~min(1k, B)
  * buckets of data and one tiny JSON — never the table — and readers
  * of any existing version are untouched (their files are immutable).
  *
  * Commit atomicity is create-with-overwrite=false on the manifest
  * path — the same put-if-absent primitive Delta's log relies on.
  * Single writer per table (two racing writers fail loudly on the
  * manifest create, and the loser's orphan data dir is swept by the
  * next vacuum). Readers resolve a version by reading one small JSON;
  * a reader pinned to version v keeps working through any number of
  * later merges, and through vacuum as long as v is retained.
  *
  * Deliberately NOT here (use Delta/Iceberg when these matter):
  * concurrent-writer conflict resolution, file-level column stats,
  * schema enforcement beyond union-by-name widening, streaming CDF.
  * The semantics a user of this engine needs — snapshot isolation,
  * time travel, key-scoped merge cost, vacuum — are all present and
  * spec'd (VersionedTableSpec), and v20 puts the whole lifecycle
  * under the DuckDB oracle gate.
  */
object VersionedTable {
  /** Bucket column name — an internal layout column, never part of the
    * user schema (reads drop it; updates must not carry it). */
  val KB = "kb"
  private val LOG = "_log"

  final case class Snapshot(version: Long, numBuckets: Int,
      keyCols: Seq[String], schema: StructType, owners: Map[Int, String])

  private def fsOf(spark: SparkSession, path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(root: HPath, v: Long): HPath =
    new HPath(new HPath(root, LOG), f"$v%08d.json")

  /** Committed versions, ascending (vacuumed versions are absent). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, path)
    val log = new HPath(root, LOG)
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted
  }

  def snapshot(spark: SparkSession, path: String,
      asOf: Option[Long] = None): Snapshot = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no versioned table at $path (no $LOG/ manifests)")
    val v = asOf.getOrElse(vs.max)
    require(vs.contains(v),
      s"version $v of $path does not exist (available: ${vs.mkString(", ")}" +
        " — a vacuumed version is gone for good)")
    val (fs, root) = fsOf(spark, path)
    val in = fs.open(manifestPath(root, v))
    val bytes =
      try { val o = new java.io.ByteArrayOutputStream(); in.transferTo(o); o.toByteArray }
      finally in.close()
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    require(m != null && m.has("owners"),
      s"manifest for version $v of $path is unreadable — a crashed commit; " +
        "delete the manifest file to roll back to the previous version")
    val owners = {
      val it = m.get("owners").fields()
      val b = Map.newBuilder[Int, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey.toInt -> e.getValue.asText()) }
      b.result()
    }
    val keys = {
      val a = m.get("keyCols")
      (0 until a.size()).map(a.get(_).asText())
    }
    Snapshot(m.get("version").asLong(), m.get("numBuckets").asInt(), keys,
      DataType.fromJson(m.get("schema").asText()).asInstanceOf[StructType], owners)
  }

  /** Read the table as of `asOf` (latest when None). The result drops
    * the internal bucket column; one scan per live commit dir, pruned
    * to the buckets that dir still owns. */
  def read(spark: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame =
    readBuckets(spark, path, snapshot(spark, path, asOf), None)

  private def readBuckets(spark: SparkSession, path: String, sn: Snapshot,
      buckets: Option[Set[Int]]): DataFrame = {
    val byDir = sn.owners.toSeq
      .filter { case (b, _) => buckets.forall(_.contains(b)) }
      .groupMap(_._2)(_._1)
    if (byDir.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sn.schema)
    else byDir.toSeq.sortBy(_._1).map { case (dir, bs) =>
      // kb is a directory-partition column inside each commit dir, so
      // the isin prunes at file listing; select(schema columns) rather
      // than drop(KB) so every branch aligns for the union even across
      // schema-widening commits
      spark.read.parquet(s"$path/$dir")
        .filter(col(KB).isin(bs.map(Int.box).toIndexedSeq: _*))
        .drop(KB)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def listBuckets(fs: FileSystem, dir: HPath): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(s"$KB=")).map(_.stripPrefix(s"$KB=").toInt)

  private def writeManifest(fs: FileSystem, root: HPath, v: Long,
      numBuckets: Int, keyCols: Seq[String], schema: StructType,
      owners: Map[Int, String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("version", v)
    node.put("numBuckets", numBuckets)
    val ka = node.putArray("keyCols")
    keyCols.foreach(ka.add)
    node.put("schema", schema.json)
    val on = node.putObject("owners")
    owners.toSeq.sortBy(_._1).foreach { case (b, d) => on.put(b.toString, d) }
    fs.mkdirs(new HPath(root, LOG))
    // overwrite=false IS the commit: a concurrent writer (or a re-run
    // of a crashed one) fails here, before any reader can see v
    val out = fs.create(manifestPath(root, v), false)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }

  /** Key-scoped MERGE committing a NEW version; returns it. Matched
    * keys are replaced, unmatched update rows insert, tombstoned keys
    * (`deleteCol` true) are removed; all other rows' files are not
    * even read. Contracts (all checked loudly, same as `mergeParquet`):
    * update keys unique and non-null within the batch; no `kb` column
    * in the updates; `numBuckets`/`keyCols` fixed at table creation;
    * single writer.
    *
    * Execution shape (each item measured at the sf1 gate): the caller's
    * `updates` plan is PERSISTED for the duration of the merge — it
    * feeds the contract check, the survivors anti-join, and the write,
    * and an uncached plan re-runs its whole upstream (often an
    * aggregate of a fact table) once per consumer. The contract check
    * and the affected-bucket collect are ONE aggregation job (the
    * offending-key lookup runs only on the failure path). The commit
    * write repartitions by bucket first, so each bucket is exactly one
    * file regardless of upstream task layout — without it a B-bucket
    * commit from T tasks writes up to B×T files, and every later
    * bucket-pruned read pays the file-count. A pathologically hot
    * bucket serializing through one write task is the signal to raise
    * numBuckets (the same knob that scopes merge cost). */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], deleteCol: Option[String] = None,
      numBuckets: Int = 64): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(numBuckets > 0, "numBuckets must be positive")
    require(!updates.columns.contains(KB),
      s"updates must not carry a '$KB' column — it is the table's bucket key")
    deleteCol.foreach(c => require(updates.columns.contains(c),
      s"deleteCol '$c' not in updates schema ${updates.columns.mkString(",")}"))
    val bucket =
      pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets.toLong)).cast("int")
    val u = updates.persist()
    try {
      // one job: per-key multiplicity, null keys, and the affected
      // bucket set together
      val stats = u.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("maxn"),
          max(keyCols.map(col(_).isNull).reduce(_ || _).cast("int")).as("anynull"),
          collect_set(bucket).as("bks"))
        .collect()(0)
      if (!stats.isNullAt(0) && (stats.getLong(0) > 1 || stats.getInt(1) > 0)) {
        val bad = u.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > 1 || keyCols.map(col(_).isNull).reduce(_ || _))
          .limit(1).collect()
        throw new IllegalArgumentException(
          s"merge: null or duplicate key ${bad.headOption.getOrElse("")} in the " +
            s"update batch for (${keyCols.mkString(",")}) — keys must be unique " +
            "and non-null; compact a versioned log first (the v16 struct-max shape)")
      }
      val affected =
        if (stats.isNullAt(2)) Set.empty[Int]
        else stats.getSeq[Int](2).toSet // <= numBuckets ints on the driver
      val dataCols = u.columns.filterNot(c => deleteCol.contains(c)).toSeq
      val upserts = deleteCol
        .map(c => u.filter(!coalesce(col(c), lit(false))))
        .getOrElse(u)
        .select(dataCols.map(col): _*)
      val (fs, root) = fsOf(spark, path)
      val vs = versions(spark, path)
      val v = if (vs.isEmpty) 0L else {
        val sn = snapshot(spark, path, None)
        require(sn.numBuckets == numBuckets,
          s"table $path was created with numBuckets=${sn.numBuckets}, " +
            s"merge called with $numBuckets — bucketing is fixed at creation")
        require(sn.keyCols == keyCols,
          s"table $path is keyed by (${sn.keyCols.mkString(",")}), " +
            s"merge called with (${keyCols.mkString(",")})")
        sn.version + 1
      }
      val dir = f"d$v%08d_" + java.util.UUID.randomUUID().toString.take(8)
      val (merged, owners) =
        if (vs.isEmpty) (upserts, Map.empty[Int, String])
        else {
          val sn = snapshot(spark, path, None)
          if (affected.isEmpty) return sn.version // empty batch: no-op
          val cur = readBuckets(spark, path, sn, Some(affected))
          val survivors =
            cur.join(u.select(keyCols.map(col): _*), keyCols, "left_anti")
          (survivors.unionByName(upserts, allowMissingColumns = true),
            sn.owners -- affected)
        }
      // mode("error"): the dir is version-unique, anything there is a bug
      merged.withColumn(KB, bucket)
        .repartition(col(KB))
        .write.mode("error").partitionBy(KB).parquet(s"$path/$dir")
      val staged = listBuckets(fs, new HPath(root, dir))
      writeManifest(fs, root, v, numBuckets, keyCols,
        merged.schema, owners ++ staged.map(_ -> dir))
      v
    } finally u.unpersist(blocking = false)
  }

  /** Key-scoped POINT READ — the serving-path lookup: rows of the
    * requested keys at a version, reading only those keys' buckets.
    * `keys` must carry exactly the table's key columns; the result is
    * a semi-join of the bucket-pruned scan against the (broadcast-
    * sized) key batch. On a 100 TB table a k-key lookup reads
    * ~min(k, B) buckets — with merge's one-file-per-bucket layout,
    * ~min(k, B) files — never the table. */
  def lookup(spark: SparkSession, path: String, keys: DataFrame,
      asOf: Option[Long] = None): DataFrame = {
    val sn = snapshot(spark, path, asOf)
    require(keys.columns.sorted.toSeq == sn.keyCols.sorted,
      s"lookup keys must be exactly (${sn.keyCols.mkString(",")}); " +
        s"got (${keys.columns.mkString(",")})")
    val bucket = pmod(xxhash64(sn.keyCols.map(col): _*),
      lit(sn.numBuckets.toLong)).cast("int")
    val wanted = keys.select(bucket.as(KB)).distinct()
      .collect().map(_.getInt(0)).toSet
    readBuckets(spark, path, sn, Some(wanted))
      .join(broadcast(keys.select(sn.keyCols.map(col): _*)),
        sn.keyCols, "left_semi")
  }

  /** Row-level CHANGE FEED between two committed versions — what a
    * downstream consumer replays to catch up from `fromV` to `toV`
    * without rescanning the table. Returns one row per inserted or
    * deleted key and TWO rows per updated key (`update_pre` with the
    * old values, `update_post` with the new — the Delta CDF shape), a
    * `change` column first, key columns next, then the union of both
    * versions' data columns (a column absent at one version reads null
    * there, matching that version's own snapshot read).
    *
    * Scale: the manifest makes the diff cheap — a bucket whose owner
    * dir is IDENTICAL in both manifests cannot differ (commit dirs are
    * immutable), so only buckets whose owner changed are read, from
    * each side, and the full-outer key join runs over those buckets
    * alone. After a 1k-key merge into a 100 TB table, the change feed
    * reads ~min(1k, B) buckets twice — never the table. Content-equal
    * rows inside a rewritten bucket (survivors copied by the merge)
    * are dropped by a null-safe struct comparison, so the feed is the
    * TRUE row diff, not "whatever the rewrite touched". A compact
    * rewrites every bucket, so a feed across it degrades to a full
    * (still correct, empty) diff — run feeds between data commits, or
    * from a pre-compaction version, as Delta users do. */
  def changes(spark: SparkSession, path: String,
      fromV: Long, toV: Long): DataFrame = {
    val snF = snapshot(spark, path, Some(fromV))
    val snT = snapshot(spark, path, Some(toV))
    val keys = snT.keyCols
    val changed = (snF.owners.keySet ++ snT.owners.keySet)
      .filter(b => snF.owners.get(b) != snT.owners.get(b))
    // union of both versions' data columns; a type change between
    // versions has no single read schema, so it fails loudly
    val dataCols = (snF.schema.fields ++ snT.schema.fields)
      .filterNot(f => keys.contains(f.name))
      .foldLeft(Vector.empty[(String, DataType)]) { case (acc, f) =>
        acc.find(_._1 == f.name) match {
          case Some((_, t0)) =>
            require(t0 == f.dataType, s"column ${f.name} changed type " +
              s"$t0 -> ${f.dataType} between versions $fromV and $toV")
            acc
          case None => acc :+ (f.name -> f.dataType)
        }
      }
    def side(sn: Snapshot, alias: String): DataFrame = {
      val df = readBuckets(spark, path, sn, Some(changed))
      val have = df.columns.toSet
      val row = struct(dataCols.map { case (n, t) =>
        (if (have(n)) col(n) else lit(null).cast(t)).as(n) }: _*)
      df.select(keys.map(col) :+ row.as(alias): _*)
    }
    val rowT = StructType(dataCols.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, t) })
    val joined = side(snF, "pre").join(side(snT, "post"), keys, "full_outer")
    // explode skips a null array, so unchanged keys emit nothing
    val cases = when(col("pre").isNull,
        array(struct(lit("insert").as("change"), col("post").as("row"))))
      .when(col("post").isNull,
        array(struct(lit("delete").as("change"), col("pre").as("row"))))
      .when(!(col("pre") <=> col("post")), array(
        struct(lit("update_pre").as("change"), col("pre").as("row")),
        struct(lit("update_post").as("change"), col("post").as("row"))))
      .otherwise(lit(null).cast(org.apache.spark.sql.types.ArrayType(
        StructType(Seq(
          org.apache.spark.sql.types.StructField("change",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("row", rowT))))))
    joined.select(keys.map(col) :+ explode(cases).as("c"): _*)
      .select(Seq(col("c.change").as("change")) ++ keys.map(col) ++
        dataCols.map { case (n, _) => col(s"c.row.$n").as(n) }: _*)
  }

  /** INCREMENTAL VIEW MAINTENANCE (the counting algorithm) over a
    * change feed in this table's CDF shape: refresh a materialized
    * count/sum aggregate from the row DIFF instead of recomputing it
    * from the snapshot. Each feed row carries a signed weight — +1 for
    * `insert`/`update_post`, −1 for `delete`/`update_pre` — so the
    * per-group delta is a plain aggregation of the feed, and the
    * refreshed view is `view ⊎ delta` re-aggregated, dropping groups
    * whose multiplicity support reaches zero. Cost is
    * Θ(|delta| + |view|) — at 100 TB the feed is merge-batch-sized and
    * the view is groups-sized, so maintenance never touches the table;
    * the recompute it replaces is a full snapshot scan per refresh.
    * Requirements, stated not assumed: `countCol` must be a COUNT
    * (multiplicity) column and `sumCols` SUM columns — min/max and
    * other non-subtractable aggregates cannot be maintained from a
    * diff (a deleted max needs the runner-up) and belong to the
    * recompute path. With integer-exact sum columns the maintained
    * view is BIT-IDENTICAL to the recompute (addition is associative
    * and every delete cancels exactly what its insert added) — that
    * equality is the oracle gate for v22_view_maintenance and the
    * band-emptying law in VersionedTableSpec.
    *
    * `feed` must carry `change` plus the view's group keys and sum
    * columns (project/derive them from the raw feed first — e.g. a
    * band key computed from a payload column). Updates that leave a
    * row's group and measures unchanged cancel out by construction.
    */
  def maintain(view: DataFrame, feed: DataFrame, keys: Seq[String],
      countCol: String, sumCols: Seq[String]): DataFrame = {
    val w = when(col("change").isin("insert", "update_post"), lit(1L))
      .otherwise(lit(-1L))
    val deltaAggs = sum(col("_w")).as(countCol) +:
      sumCols.map(c => sum(col("_w") * col(c)).as(c))
    val delta = feed.withColumn("_w", w)
      .groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val outCols = (keys :+ countCol) ++ sumCols
    val mergeAggs = sum(col(countCol)).as(countCol) +:
      sumCols.map(c => sum(col(c)).as(c))
    view.select(outCols.map(col): _*)
      .unionByName(delta.select(outCols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .filter(col(countCol) > 0)
  }

  /** ROLL BACK to version `v` by committing a new version whose owner
    * map (and schema) are `v`'s — a pure manifest write, zero data
    * movement, because every dir `v` referenced is immutable and still
    * present while `v` is retained. O(1) rollback on a table of any
    * size; history is preserved (the bad versions stay readable for
    * forensics until vacuumed), exactly Delta's RESTORE semantics. */
  def restore(spark: SparkSession, path: String, v: Long): Long = {
    val target = snapshot(spark, path, Some(v))
    val cur = snapshot(spark, path, None)
    val nv = cur.version + 1
    val (fs, root) = fsOf(spark, path)
    writeManifest(fs, root, nv, cur.numBuckets, cur.keyCols,
      target.schema, target.owners)
    nv
  }

  /** Rewrite every live bucket into ONE new commit dir and commit the
    * result as a new version — the defrag counterpart of merge. After
    * N merges a snapshot's read fans out to up to N commit dirs (one
    * union branch each); compact returns that to one scan without
    * changing content (asserted row-identical in VersionedTableSpec).
    * Earlier versions keep reading their old dirs until vacuumed, so
    * compaction is as non-disruptive as any other commit. This is the
    * whole-table generalization of v17's small-file compaction
    * PLANNING: here the rewrite actually runs, under the same
    * immutable-commit contract as merge. */
  def compact(spark: SparkSession, path: String): Long = {
    val sn = snapshot(spark, path, None)
    val v = sn.version + 1
    val dir = f"d$v%08d_" + java.util.UUID.randomUUID().toString.take(8)
    val bucket = pmod(xxhash64(sn.keyCols.map(col): _*),
      lit(sn.numBuckets.toLong)).cast("int")
    val cur = readBuckets(spark, path, sn, None)
    val (fs, root) = fsOf(spark, path)
    // one file per bucket, same rationale as merge's pre-write shuffle
    cur.withColumn(KB, bucket)
      .repartition(col(KB))
      .write.mode("error").partitionBy(KB).parquet(s"$path/$dir")
    val staged = listBuckets(fs, new HPath(root, dir))
    writeManifest(fs, root, v, sn.numBuckets, sn.keyCols, cur.schema,
      staged.map(_ -> dir).toMap)
    v
  }

  /** Drop all but the newest `retainLast` versions and delete every
    * data directory no retained manifest references; returns the
    * removed directory names. Manifests go first, then data — a crash
    * in between leaves unreferenced dirs that the next vacuum sweeps.
    * A reader pinned to a vacuumed version fails loudly at `snapshot`
    * (and a long-lived DataFrame over vacuumed files fails at scan —
    * the standard time-travel retention trade, same as Delta VACUUM). */
  def vacuum(spark: SparkSession, path: String,
      retainLast: Int = 1): Seq[String] = {
    require(retainLast >= 1, "must retain at least the current version")
    val (fs, root) = fsOf(spark, path)
    val vs = versions(spark, path)
    val kept = vs.takeRight(retainLast)
    val referenced = kept
      .flatMap(v => snapshot(spark, path, Some(v)).owners.values).toSet
    vs.dropRight(retainLast)
      .foreach(v => fs.delete(manifestPath(root, v), false))
    val removable = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName != LOG)
      .map(_.getPath.getName)
      .filterNot(referenced)
    removable.foreach(d => fs.delete(new HPath(root, d), true))
    removable.sorted
  }
}
