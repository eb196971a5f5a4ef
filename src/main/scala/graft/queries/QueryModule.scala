package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query per implemented operator (SURVEY.md §2).
  *
  * Contract (driver-enforced, see Verify.scala):
  *   - `queries(name)(spark, sfDir)` returns the operator's result on the
  *     parquet tables under `sfDir` (TESTDATA.md).
  *   - `oracle(name)` is equivalent ANSI SQL the driver runs in DuckDB over
  *     the same parquet files; the driver hash-compares both results with
  *     columns sorted by name. Therefore every computed column is aliased
  *     identically on both sides, every query ends in a total deterministic
  *     ORDER BY, and double-typed aggregates are rounded so the two engines'
  *     (order-dependent) float summation cannot differ in the last bits.
  *   - Queries with no oracle entry (non-SQL-expressible ops) get a weaker
  *     rows>0 check from the driver and a ScalaTest spec here instead.
  */
trait QueryModule {
  type QueryFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QueryFn]
  def oracle: Map[String, String]
}
