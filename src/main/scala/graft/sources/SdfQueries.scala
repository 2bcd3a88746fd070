package graft.sources

import graft.GraftQuery
import org.apache.spark.sql.functions._

/** Driver-visible entries for the SDF ETL surface (SURVEY.md §2A).
  * SDF inputs are not parquet, so the extraction entries stage the
  * RAW record text to a parquet scratch table as part of the run;
  * the oracle SQL then re-derives every layout column from those raw
  * records with DuckDB's own regex engine — a genuine cross-engine
  * check of the extraction semantics (tag-block grammar, priority
  * fallback, dtype casts, transforms, NOT_NULL drops), generated
  * from the SAME LayoutSpec the Spark side runs so the two can
  * never desync. `sdf_read` (file splitting / boundary
  * normalization) stays rows-only — its parity is pinned against
  * the reference's own CID sequences in SdfSpec.
  */
object SdfQueries {
  /** The reference repo's own sample SDF files (read-only). */
  val TestSdfDir = "/root/reference/pubchem2sqlite/tests/sdf"
  val TestSdfGlob = s"$TestSdfDir/*.sdf"

  /** Where the raw records are staged for the DuckDB oracle. */
  val StagePath: String = s"${System.getProperty("java.io.tmpdir")}/graft_sdf_records.parquet"

  private def duckdbType(dtype: String): String = dtype.toLowerCase match {
    case "integer" | "int"                           => "BIGINT"
    case "real" | "float" | "double"                 => "DOUBLE"
    case "varchar" | "character" | "text" | "string" => "VARCHAR"
    case other => throw new IllegalArgumentException(s"Invalid dtype: $other.")
  }

  /** DuckDB twin of Sdf.extractColumn: NULLIF-regex tag values with
    * priority COALESCE, dtype cast, transform, final cast. Only the
    * transforms the default layout uses need an SQL form. */
  private def duckdbColumn(c: ColumnSpec): String = {
    val tags = c.sdTags.map(t =>
      s"NULLIF(regexp_extract(sdf, '(?m)^> <$t>\\n([^\\n]*)', 1), '')")
    val raw = if (tags.size == 1) tags.head else s"COALESCE(${tags.mkString(", ")})"
    val typed = s"CAST($raw AS ${duckdbType(c.dtype)})"
    val transformed = c.createLike match {
      case None                            => typed
      case Some(Transform.SplitFirst(sep)) => s"split_part($typed, '$sep', 1)"
      case Some(other) => throw new IllegalArgumentException(
        s"no DuckDB oracle form for transform $other")
    }
    s"""CAST($transformed AS ${duckdbType(c.dtype)}) AS "${c.name}""""
  }

  private def extractSql(layout: LayoutSpec, notNullFiltered: Boolean): String = {
    val cols = layout.columns.map(duckdbColumn).mkString(",\n    ")
    val where =
      if (!notNullFiltered || layout.notNullColumns.isEmpty) ""
      else layout.notNullColumns.map(n => s""""$n" IS NOT NULL""")
        .mkString("\nWHERE ", " AND ", "")
    s"""SELECT
       |    $cols
       |FROM read_parquet('$StagePath/*.parquet')$where
       |ORDER BY cid""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("sdf_read", None, (s, _) =>
      Sdf.read(s, TestSdfGlob)
        .select(col("cid"),
          element_at(split(col("src_file"), "/"), -1).as("filename"),
          length(col("sdf")).as("n_chars"))
        .orderBy(col("cid"))),
    GraftQuery("sdf_extract", Some(extractSql(LayoutSpec.default, notNullFiltered = false)),
      (s, _) => {
        val raw = Sdf.read(s, TestSdfGlob)
        raw.select(col("sdf")).write.mode("overwrite").parquet(StagePath)
        Sdf.extract(raw, LayoutSpec.default).orderBy(col("cid"))
      }),
    GraftQuery("compounds_pipeline", Some(extractSql(LayoutSpec.default, notNullFiltered = true)),
      (s, _) => {
        val raw = Sdf.read(s, TestSdfGlob)
        raw.select(col("sdf")).write.mode("overwrite").parquet(StagePath)
        Sdf.filterNotNull(Sdf.extract(raw, LayoutSpec.default), LayoutSpec.default)
          .orderBy(col("cid"))
      }),
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
