package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.ext._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator from SURVEY.md §2 is one named entry in `queries` with
  * matching DuckDB oracle SQL in `oracleSql` (same column names, same
  * deterministic ORDER BY). Modules register themselves below.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Relational,
    Advanced,
    Joins,
    Windows,
    Eventing,
    Graph,
    TextOps,
    Dedup,
    Similarity,
    TextAnalysis,
    Pipelines,
    Media,
    SqlSurface,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
