package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Column aliases MUST match between
  * the two — the driver sorts columns by name before hashing.
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Registry {
  def all: Seq[GraftQuery] =
    operators.Relational.queries ++
      operators.TextOps.queries ++
      operators.Pack.queries ++
      operators.Bpe.queries ++
      operators.Dedup.queries ++
      operators.Curation.queries ++
      operators.Retract.queries ++
      operators.Similarity.queries ++
      sources.SdfQueries.queries ++
      sinks.ZOrder.queries ++
      streaming.Streams.queries ++
      multimodal.Multimodal.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
