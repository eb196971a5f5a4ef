package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** `format("graft")` / `USING graft` — the versioned table as a
  * first-class Spark data source (the Delta UX):
  *
  * {{{
  *   spark.read.format("graft").option("versionAsOf", 2).load(path)
  *   CREATE TABLE t USING graft OPTIONS (path '...', versionAsOf '2')
  * }}}
  *
  * Registered by short name through the standard
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`
  * mechanism, so DDL resolves it with no imports. The relation is
  * [[VersionedScan.baseRelation]] — the same custom FileIndex the
  * programmatic `VersionedTable.read` plans through, so bucket
  * pruning, data skipping (numeric AND string), and schema evolution
  * behave identically on both surfaces (asserted in
  * GraftProviderSpec). A snapshot relation is immutable by
  * construction: the manifest pins the file set at createRelation
  * time, which is exactly time-travel's contract.
  *
  * Reference anchor: the reference serves query results back from its
  * MySQL store by plain SQL over a named table (mainTesting.py:99-115);
  * `USING graft` is that serving surface on the versioned lakehouse
  * store, with `versionAsOf` adding the time travel MySQL never had.
  */
final class GraftTableProvider extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    // `load(path)`/DDL LOCATION arrive as "path"; be case-tolerant on
    // the option name since DDL option keys are case-insensitive
    val params = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = params.getOrElse("path",
      throw new IllegalArgumentException(
        "graft data source requires a path: .load(<table dir>) or " +
          "OPTIONS (path '...')"))
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
}
