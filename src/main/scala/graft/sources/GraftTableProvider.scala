package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSourceProvider}
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
    with DataSourceRegister {

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
      try { VersionedTable.versions(spark, path).nonEmpty }
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
        val keyCols = params.getOrElse("keycols",
          throw new IllegalArgumentException(
            "graft writes need option(\"keyCols\", \"k1,k2\") — the merge " +
              "is key-scoped")).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val txn = (params.get("txnappid"), params.get("txnversion")) match {
          case (Some(a), Some(v)) => Some((a, v.toLong))
          case (None, None) => None
          case _ => throw new IllegalArgumentException(
            "txnAppId and txnVersion must be supplied together")
        }
        // an existing table's bucket count is part of its layout — the
        // merge must pass it back (or the option overrides explicitly,
        // e.g. for a first write)
        val numBuckets = params.get("numbuckets").map(_.toInt).getOrElse {
          if (exists) VersionedTable.snapshot(spark, path, None).numBuckets
          else 64
        }
        VersionedTable.merge(spark, path, data, keyCols,
          deleteCol = params.get("deletecol"),
          numBuckets = numBuckets,
          mor = params.get("mor").exists(_.toBoolean),
          autoCompactLayers = params.get("autocompactlayers").map(_.toInt)
            .getOrElse(0),
          txn = txn)
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
    VersionedTable.publishFeeds(spark, path)
    VersionedTable.publishedFeedVersions(spark, path).lastOption
  }

  /** Trigger.AvailableNow latches the catch-up TARGET here (the
    * FileStreamSource pattern): batches then pace toward it through
    * `latestOffset` until it is reached, so `maxVersionsPerTrigger`
    * still bounds every batch during an available-now drain instead
    * of one giant batch (or, worse, a drain that stops at the first
    * paced offset — what the plain-Source wrapper would do). */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = fetchLatest()

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
    val latest = availableNowTarget.orElse(fetchLatest())
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
          startingVersion.map(_ - 1).getOrElse(-1L)), ver(end)))

  override def stop(): Unit = ()
}
