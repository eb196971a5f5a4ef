package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One declared source in a catalog: the engine-native analog of a
  * workbook sheet — a name, a location, a format, and a MANDATORY
  * schema (Sources.scala schema-on-read discipline). */
case class CatalogSource(name: String, path: String, format: String, schema: StructType)

/** Content-driven source discovery (SURVEY.md §2.1 S2): the engine
  * form of the reference's `cari_sheet_excel` (mainTesting.py:379-389),
  * which walks a workbook's sheets in order and returns the FIRST one
  * where any cell contains the searched phrase (case-insensitive,
  * trimmed).
  *
  * Engine shape: a catalog is an ordered Seq of schema-declared
  * sources; discovery probes each in declaration order with a single
  * any-column containment predicate and an existence check — the probe
  * plan is scan → filter → limit(1), so a match in the first row group
  * stops the scan. Probing stays sequential by design: first-match-in-
  * order IS the reference semantics, and the early-exit makes the
  * common case (keyword in an early source) cheap at any scale.
  */
object SourceCatalog {

  def load(spark: SparkSession, src: CatalogSource): DataFrame = src.format match {
    case "csv"     => Sources.csv(spark, src.path, src.schema)
    case "json"    => Sources.jsonLines(spark, src.path, src.schema)
    case "parquet" => spark.read.schema(src.schema).parquet(src.path)
    case other     => throw new IllegalArgumentException(s"unknown format: $other")
  }

  /** Reference cell test (str(cell).strip().lower() containment) over
    * every column: non-string columns are cast, nulls stay null and
    * drop out of the OR like empty cells. */
  def containsKeyword(df: DataFrame, keyword: String): Column =
    df.columns.map(c => lower(trim(col(c).cast("string"))).contains(keyword.toLowerCase))
      .reduce(_ || _)

  /** First source in catalog order whose content matches, if any. */
  def discover(spark: SparkSession, catalog: Seq[CatalogSource], keyword: String): Option[CatalogSource] =
    catalog.find { src =>
      val df = load(spark, src)
      !df.filter(containsKeyword(df, keyword)).isEmpty
    }
}
