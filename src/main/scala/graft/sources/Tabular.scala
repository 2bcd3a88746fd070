package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The layout engine over tabular formats (SURVEY.md §7 "later
  * rounds": csv/json sources for the same layout engine).
  *
  * The SDF reader maps `> <TAG>` blocks to columns; here the same
  * `LayoutSpec` maps SOURCE FIELD NAMES to columns — SD_TAG entries
  * double as the source-column priority list, and dtype casts,
  * CREATE_LIKE transforms and NOT_NULL filtering behave identically.
  * A layout written for the SDF pipeline works unchanged on a csv or
  * json export of the same data.
  */
object Tabular {

  /** One output column from a row of raw source columns. Missing
    * source fields contribute null (so tag-priority fallback works
    * across heterogeneous files). */
  private def extractColumn(df: DataFrame, spec: ColumnSpec): Column = {
    val present = df.columns.toSet
    val candidates = spec.sdTags.filter(present.contains).map(col)
    val raw =
      if (candidates.isEmpty) lit(null)
      else if (candidates.size == 1) candidates.head
      else coalesce(candidates: _*)
    val typed = raw.cast(spec.sparkType)
    spec.createLike.fold(typed)(_(typed)).cast(spec.sparkType).as(spec.name)
  }

  def extract(df: DataFrame, layout: LayoutSpec): DataFrame = {
    val extracted = df.select(layout.columns.map(c => extractColumn(df, c)): _*)
    Sdf.filterNotNull(extracted, layout)
  }

  /** CSV with a header row → compounds table per layout.
    * `options` lets a caller pin the file's null encoding (e.g.
    * `nullValue -> "\\N"` for exports staged by [[graft.sources
    * .SdfQueries]], whose writer distinguishes null from the empty
    * string with an explicit sentinel). */
  def fromCsv(spark: SparkSession, path: String, layout: LayoutSpec = LayoutSpec.default,
              options: Map[String, String] = Map.empty): DataFrame =
    extract(spark.read.option("header", "true").options(options).csv(path), layout)

  /** JSON-lines → compounds table per layout. */
  def fromJson(spark: SparkSession, path: String, layout: LayoutSpec = LayoutSpec.default): DataFrame =
    extract(spark.read.json(path), layout)

  /** ORC → compounds table per layout (columnar exchange format for
    * warehouses that are not parquet-based). */
  def fromOrc(spark: SparkSession, path: String, layout: LayoutSpec = LayoutSpec.default): DataFrame =
    extract(spark.read.orc(path), layout)
}
