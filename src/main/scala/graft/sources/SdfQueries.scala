package graft.sources

import graft.GraftQuery
import org.apache.spark.sql.functions._

/** Driver-visible entries for the SDF ETL surface (SURVEY.md §2A).
  * SDF inputs are not parquet, so there is no DuckDB oracle — these
  * are rows-only checks; the reference-parity expectations live in
  * SdfSpec (CID sequences, xlogp3 fallback, NOT_NULL drop counts).
  */
object SdfQueries {
  /** The reference repo's own sample SDF files (read-only). */
  val TestSdfDir = "/root/reference/pubchem2sqlite/tests/sdf"
  val TestSdfGlob = s"$TestSdfDir/*.sdf"

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("sdf_read", None, (s, _) =>
      Sdf.read(s, TestSdfGlob)
        .select(col("cid"),
          element_at(split(col("src_file"), "/"), -1).as("filename"),
          length(col("sdf")).as("n_chars"))
        .orderBy(col("cid"))),
    GraftQuery("sdf_extract", None, (s, _) =>
      Sdf.extract(Sdf.read(s, TestSdfGlob), LayoutSpec.default)
        .orderBy(col("cid"))),
    GraftQuery("compounds_pipeline", None, (s, _) =>
      Sdf.compounds(s, TestSdfGlob).orderBy(col("cid"))))
}
