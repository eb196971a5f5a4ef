package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

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
    with CreatableRelationProvider with DataSourceRegister {

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
}
