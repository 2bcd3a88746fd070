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
      Sdf.compounds(s, TestSdfGlob).orderBy(col("cid"))),
    // Runs the idempotent incremental ingest twice into a fresh
    // temp warehouse and returns the manifest — the second call must
    // be a no-op (reference sdf_file skip semantics, utils.py:272).
    GraftQuery("warehouse_ingest", None, (s, _) => {
      val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
      graft.sinks.Warehouse.ingest(s, TestSdfGlob, wh)
      val second = graft.sinks.Warehouse.ingest(s, TestSdfGlob, wh)
      require(second.filesLoaded.isEmpty, "re-ingest must skip loaded files")
      graft.sinks.Warehouse.manifest(s, wh)
        .select("filename", "lowest_cid", "highest_cid", "n_compounds")
        .orderBy(col("filename"))
    }))
}
