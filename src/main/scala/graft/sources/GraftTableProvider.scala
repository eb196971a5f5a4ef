package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `format("graft")` / `USING graft` — the versioned table as a
  * first-class Spark data source (the Delta UX), both directions:
  *
  * {{{
  *   spark.read.format("graft").option("versionAsOf", 2).load(path)
  *   CREATE TABLE t USING graft OPTIONS (path '...', versionAsOf '2')
  *   df.write.format("graft").option("keyCols", "k")
  *     .mode("append").save(path)       // key-scoped MERGE (upsert)
  * }}}
  *
  * Registered by short name through the standard
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`
  * mechanism, so DDL resolves it with no imports. The READ relation is
  * [[VersionedScan.baseRelation]] — the same custom FileIndex the
  * programmatic `VersionedTable.read` plans through, so bucket
  * pruning, data skipping (numeric AND string), and schema evolution
  * behave identically on both surfaces (asserted in
  * GraftProviderSpec). A snapshot relation is immutable by
  * construction: the manifest pins the file set at createRelation
  * time, which is exactly time-travel's contract.
  *
  * The WRITE maps SaveMode onto the table's one honest mutation,
  * key-scoped MERGE ([[VersionedTable.merge]]):
  *   - `Append` — upsert the batch (create the table on first write);
  *     options: `keyCols` (required, comma-separated), `numBuckets`,
  *     `mor`, `deleteCol`, `autoCompactLayers`, `txnAppId`+`txnVersion`
  *     (the idempotent writer ledger). An existing table's bucket
  *     count is reused automatically.
  *   - `ErrorIfExists` (the default) — like Append, but refuses an
  *     existing table.
  *   - `Ignore` — create if absent, else leave untouched.
  *   - `Overwrite` — REFUSED loudly: a versioned table's history is
  *     the point; replacing it wholesale is `restore`/`vacuum`
  *     territory, not a save mode (mirrors Delta's
  *     `replaceWhere`-less default posture).
  *
  * Reference anchor: the reference serves query results back from its
  * MySQL store by plain SQL over a named table (mainTesting.py:99-115)
  * and loads via per-row INSERT loops (mainTesting.py:59-79);
  * `USING graft` + `write.format("graft")` are those two surfaces on
  * the versioned lakehouse store, with `versionAsOf` adding the time
  * travel MySQL never had.
  */
final class GraftTableProvider extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def lower(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase -> v }

  private def pathOf(params: Map[String, String]): String =
    params.getOrElse("path",
      throw new IllegalArgumentException(
        "graft data source requires a path: .load/.save(<table dir>) or " +
          "OPTIONS (path '...')"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val params = lower(parameters)
    val path = pathOf(params)
    val asOf = params.get("versionasof").map { v =>
      try v.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"versionAsOf must be a version number, got '$v'")
      }
    }
    val spark = sqlContext.sparkSession
    val sn = VersionedTable.snapshot(spark, path, asOf)
    VersionedScan.baseRelation(spark, path, sn, None)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val params = lower(parameters)
    val path = pathOf(params)
    val spark = sqlContext.sparkSession
    // `versions` already answers `empty` for a missing table (it probes
    // the log dir before listing); only a listing race with a concurrent
    // vacuum can surface FileNotFoundException, which still means
    // "absent". Any OTHER failure (permissions, FS outage) must
    // propagate — swallowing it would let SaveMode.Ignore mutate a table
    // it promised to leave alone, and ErrorIfExists lose its guard.
    val exists =
      try { VersionedTable.latestVersion(spark, path).isDefined }
      catch { case _: java.io.FileNotFoundException => false }
    mode match {
      case SaveMode.Overwrite =>
        throw new IllegalArgumentException(
          "graft does not support SaveMode.Overwrite: the table's version " +
            "history is the contract. Upsert with mode(\"append\") (a " +
            "key-scoped MERGE), or roll back with VersionedTable.restore.")
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"versioned table $path already exists (SaveMode.ErrorIfExists); " +
            "use mode(\"append\") to merge into it")
      case SaveMode.Ignore if exists => () // leave the table untouched
      case _ =>
        GraftTableProvider.mergeWithOptions(spark, path, data, params,
          exists, txn = GraftTableProvider.txnOf(params))
    }
    val sn = VersionedTable.snapshot(spark, path, None)
    VersionedScan.baseRelation(spark, path, sn, None)
  }

  // ---- streaming read: spark.readStream.format("graft").load(path) --

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "the graft stream's schema is the table's own feed schema — " +
        "drop the .schema(...) call")
    val path = pathOf(lower(parameters))
    (shortName(), VersionedTable.feedStreamSchema(
      sqlContext.sparkSession, path))
  }

  /** `df.writeStream.format("graft")` — the streaming MoR/COW ingest
    * loop as a NAMED sink. Every micro-batch is one key-scoped MERGE;
    * exactly-once comes from the idempotent writer ledger: the txn id
    * is (writer identity, batchId), so a replayed micro-batch after a
    * crash is recognized from the manifest and skipped before any job
    * runs (the e29 contract, now without hand-writing foreachBatch).
    * Writer identity, in precedence order (resolved per batch, pinned
    * by GraftProviderSpec):
    *   1. option("txnAppId") — explicit, for operators who manage it;
    *   2. the STREAMING QUERY ID (the `sql.streaming.queryId` local
    *      property the engine sets on every batch thread) — persisted
    *      in the checkpoint's metadata file, so it survives a
    *      checkpoint RELOCATION (the Delta sink's choice), and is
    *      unique per query, so two queries writing the same table can
    *      never silently skip each other's batches;
    *   3. the checkpoint location string — only outside a real
    *      streaming runtime (no query id property set); NOTE the
    *      hazards that made it the fallback rather than the default:
    *      relocating the checkpoint changes the identity (a replayed
    *      batch would re-commit), and two queries passing the same
    *      path collide.
    * Output modes Append and Update both map onto the merge (per-key
    * newest state; that IS update semantics); Complete is refused — a
    * versioned table's history is the point. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val params = lower(parameters)
    require(partitionColumns.isEmpty,
      "graft tables lay out by key bucket; partitionBy is not supported")
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Complete(),
      "graft sink: Complete mode would rewrite the table every batch — " +
        "the versioned history is the point. Use append/update (both " +
        "are key-scoped MERGE upserts).")
    new GraftStreamSink(sqlContext.sparkSession, pathOf(params), params,
      explicitAppId = params.get("txnappid"),
      checkpointLoc = params.get("checkpointlocation"))
  }

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val params = lower(parameters)
    def longOpt(key: String, what: String): Option[Long] =
      params.get(key).map { v =>
        try v.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$what must be a number, got '$v'")
        }
      }
    new GraftChangeFeedSource(sqlContext.sparkSession, pathOf(params),
      longOpt("startingversion", "startingVersion"),
      longOpt("maxversionspertrigger", "maxVersionsPerTrigger")
        .map(n => { require(n > 0,
          s"maxVersionsPerTrigger must be positive, got $n"); n }))
  }
}

/** Analysis-time guard: a bare `INSERT INTO` on a graft table plans as
  * Spark's generic InsertIntoHadoopFsRelationCommand, which would write
  * parquet STRAIGHT INTO the table directory — bytes no manifest ever
  * references, so the "insert" silently never becomes visible (and
  * junk accumulates a vacuum won't claim). Injected as a check rule by
  * GraftExtensions: the command is recognized by its FileIndex and
  * refused with the honest alternative. */
object GraftInsertGuard
    extends (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan => Unit) {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    plan.foreach {
      case cmd: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
          if cmd.fileIndex.exists(_.isInstanceOf[VersionedFileIndex]) =>
        throw new UnsupportedOperationException(
          "INSERT INTO a graft table is not supported: the generic file " +
            "insert would write files no manifest references (an invisible " +
            "write). Upsert with df.write.format(\"graft\")" +
            ".option(\"keyCols\", ...).mode(\"append\") — a key-scoped, " +
            "versioned MERGE.")
      case _ => ()
    }
}

object GraftTableProvider {

  private[sources] def txnOf(params: Map[String, String]): Option[(String, Long)] =
    (params.get("txnappid"), params.get("txnversion")) match {
      case (Some(a), Some(v)) => Some((a, v.toLong))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "txnAppId and txnVersion must be supplied together")
    }

  /** The one write both provider surfaces (batch SaveMode and the
    * streaming sink) map onto: key-scoped MERGE with the options
    * contract — `keyCols` required, `numBuckets` from the option, the
    * caller's cached layout (`knownNumBuckets`, the streaming sink's
    * across-batch cache), or the existing table's manifest, in that
    * order; `mor`/`deleteCol`/`autoCompactLayers` passed through.
    * Returns (committed version, bucket count used) so a repeating
    * caller can cache the layout instead of re-probing per call. */
  private[sources] def mergeWithOptions(spark: SparkSession, path: String,
      data: DataFrame, params: Map[String, String], exists: Boolean,
      txn: Option[(String, Long)],
      knownNumBuckets: Option[Int] = None): (Long, Int) = {
    val keyCols = params.getOrElse("keycols",
      throw new IllegalArgumentException(
        "graft writes need option(\"keyCols\", \"k1,k2\") — the merge " +
          "is key-scoped")).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // an existing table's bucket count is part of its layout — the
    // merge must pass it back (or the option overrides explicitly,
    // e.g. for a first write)
    val numBuckets = params.get("numbuckets").map(_.toInt)
      .orElse(knownNumBuckets).getOrElse {
        if (exists) VersionedTable.snapshot(spark, path, None).numBuckets
        else 64
      }
    val v = VersionedTable.merge(spark, path, data, keyCols,
      deleteCol = params.get("deletecol"),
      numBuckets = numBuckets,
      mor = params.get("mor").exists(_.toBoolean),
      autoCompactLayers = params.get("autocompactlayers").map(_.toInt)
        .getOrElse(0),
      txn = txn)
    (v, numBuckets)
  }
}

/** The CDF stream behind `readStream.format("graft")` — the same
  * published `_feed` rows [[VersionedTable.changeFeedStream]] serves,
  * nameable by format string (the Delta CDF streaming UX), with the
  * table's COMMIT VERSION as the offset domain:
  *
  *   - `getOffset` heals any committed-but-unpublished feed (the same
  *     sweep every merge runs — watermarked, so a poll costs one feed
  *     listing), then reports the newest published version;
  *   - `getBatch(from, to)` is a partition-pruned batch read of the
  *     feed dirs in (from, to] — published feed dirs are immutable, so
  *     a checkpoint replay of the same range reads identical rows:
  *     exactly-once composes with any idempotent sink exactly as the
  *     file-source path does (e29's ledger gate).
  *
  * Offsets are plain version numbers (LongOffset); a restart arrives
  * as SerializedOffset json, so versions parse from `json` rather than
  * pattern-matching the class. `startingVersion` (the Delta CDF
  * option) is the FIRST commit version delivered — a consumer that
  * bootstrapped from `read(asOf = v0)` passes v0+1 to skip history it
  * already holds; a checkpointed offset past it wins, so restarts
  * never re-deliver. */
final class GraftChangeFeedSource(spark: SparkSession, path: String,
    startingVersion: Option[Long] = None,
    maxVersionsPerTrigger: Option[Long] = None)
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override val schema: StructType =
    VersionedTable.feedStreamSchema(spark, path)

  private def ver(o: OffsetV1): Long = o.json.trim.toLong

  private def fetchLatest(): Option[Long] = {
    // heal committed-but-unpublished feeds before listing — but as a
    // BEST-EFFORT: a read-only consumer may lack write permission on
    // _feed, and the WRITER already heals on every commit; a consumer
    // must degrade to reading what is published, not die
    try VersionedTable.publishFeeds(spark, path)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(
        s"[graft source] feed heal skipped for $path (writer heals on " +
          s"commit): $e")
    }
    VersionedTable.publishedFeedVersions(spark, path).lastOption
  }

  /** Trigger.AvailableNow latches the catch-up TARGET here (the
    * FileStreamSource pattern): batches then pace toward it through
    * `latestOffset` until it is reached, so `maxVersionsPerTrigger`
    * still bounds every batch during an available-now drain instead
    * of one giant batch (or, worse, a drain that stops at the first
    * paced offset — what the plain-Source wrapper would do). The
    * outer Option records THAT prepare ran; the inner one is the
    * latched head — distinct, so an EMPTY-at-prepare available-now
    * run latches Some(None) and terminates with no data instead of
    * falling through to live polls and consuming versions published
    * after the trigger started. */
  @volatile private var availableNowTarget: Option[Option[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(fetchLatest())

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission-control form the engine actually calls (for a Source
    * that implements it, `getOffset` is bypassed): the next batch END
    * is the published head — frozen at the available-now target when
    * one is latched — capped `maxVersionsPerTrigger` past the last
    * committed offset. Never regresses: published versions only grow,
    * and the anchor is max(committed, startingVersion-1). */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest = availableNowTarget.getOrElse(fetchLatest())
    val anchor = math.max(
      startingVersion.map(_ - 1).getOrElse(-1L),
      Option(startOffset).map(_.json.trim.toLong).getOrElse(-1L))
    latest.map { l =>
      val end = maxVersionsPerTrigger match {
        case Some(max) => math.max(anchor, math.min(l, anchor + max))
        case None => math.max(anchor, l)
      }
      LongOffset(end): OffsetV2
    }.orNull
  }

  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame =
    org.apache.spark.sql.graft.SqlBridge.asStreamingFrame(spark,
      VersionedTable.feedBatch(spark, path,
        math.max(start.map(ver).getOrElse(-1L),
          startingVersion.map(_ - 1).getOrElse(-1L)), ver(end),
        // construction-time schema: a per-batch recompute would walk
        // the manifest log on every micro-batch (and the schema is
        // fixed for a source's lifetime anyway — the restart contract)
        schema = Some(schema)))

  override def stop(): Unit = ()
}

/** One micro-batch = one key-scoped MERGE, exactly-once by ledger:
  * see [[GraftTableProvider.createSink]].
  *
  * PER-BATCH DRIVER COST IS O(1) IN HISTORY DEPTH — load-bearing for
  * this sink specifically, because it GROWS the table's history one
  * commit per batch: a per-batch `_log` listing would make its own
  * fixed cost rise linearly with uptime (the r14 `weak` finding,
  * ~139 ms/listing at 10,240 commits and climbing). Three pieces:
  * the exists/bucket-layout probe resolves ONCE and is cached across
  * batches (invalidated on any merge failure — a rebucket or true
  * conflict re-probes), the merge's own base load goes through the
  * head hint (no listing), and the feed-publication sweep inside the
  * merge walks only (watermark, head]. Measured flat in study_r15
  * `sink_depth`. */
final class GraftStreamSink(spark: SparkSession, path: String,
    params: Map[String, String], explicitAppId: Option[String],
    checkpointLoc: Option[String])
    extends org.apache.spark.sql.execution.streaming.Sink {

  /** Bucket layout resolved on the first batch, reused after — None
    * until the first successful merge or when invalidated by a merge
    * failure. (A concurrent REBUCKET surfaces as a merge conflict, so
    * a stale cache can never commit against the wrong layout — it can
    * only fail, invalidate, and re-probe.) */
  @volatile private var knownBuckets: Option[Int] = None

  private def resolveAppId(): String =
    explicitAppId
      .orElse(Option(spark.sparkContext
        .getLocalProperty("sql.streaming.queryId")))
      .orElse(checkpointLoc)
      .getOrElse(throw new IllegalArgumentException(
        "graft sink needs a stable writer identity for exactly-once: " +
          "set option(\"checkpointLocation\", ...) (the usual streaming " +
          "requirement) or an explicit option(\"txnAppId\", ...)"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine hands the batch over streaming-tagged; the merge is a
    // batch write, so re-wrap it (no Row decode — the ForeachBatchSink
    // pattern via the bridge)
    val batch = org.apache.spark.sql.graft.SqlBridge
      .asBatchFrame(data.sparkSession, data)
    val exists = knownBuckets.isDefined ||
      VersionedTable.latestVersion(spark, path).isDefined
    try {
      val (_, buckets) = GraftTableProvider.mergeWithOptions(spark, path,
        batch, params, exists, txn = Some((resolveAppId(), batchId)),
        knownNumBuckets = knownBuckets)
      knownBuckets = Some(buckets)
    } catch { case e: Throwable => knownBuckets = None; throw e }
  }

  override def toString: String = s"GraftStreamSink[$path]"
}
