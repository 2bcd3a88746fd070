package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed SDF ingestion — the reference's core product
  * (/root/reference/pubchem2sqlite/utils.py:245 `iter_sdf_file`,
  * :59 `extract_info_from_sdf`, :121 `insert_info_from_sdf_strings`)
  * re-expressed Spark-first.
  *
  * The reference reads each file whole into driver memory and splits
  * on `"$$$$"` in a single-threaded Python loop. Here the split is
  * the *record delimiter of the text source* (`lineSep = "$$$$"`),
  * so uncompressed SDF files are split at block boundaries across
  * executors — at 100 TB every executor reads its own slice, no
  * whole-file reads and no driver involvement. (`.sdf.gz` inputs
  * decode transparently but are per-file parallel only — gzip is not
  * splittable; PubChem ships thousands of files, so file-level
  * parallelism still saturates a cluster.)
  *
  * Extraction is pure `Column` expressions (`regexp_extract` +
  * `coalesce` fallback chains), so the whole record→row transform
  * runs inside WholeStageCodegen — no UDFs, no Python, no
  * per-record interpreter.
  */
object Sdf {

  /** One row per molecule: `sdf` (the record text, single-quotes
    * stripped — utils.py:264), `src_file`, `cid`.
    *
    * Boundary normalization matches the reference exactly: the
    * record excludes the newline before `$$$$` (utils.py:263
    * `[start:end_pos-1]`) and the newline after it (utils.py:267
    * `start = end_pos + 5`). Chunks with no CID tag (e.g. the
    * trailing newline after the last record) are dropped — the
    * reference's regex-[0] would fail on them anyway.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    read(spark, Seq(path))

  /** Multi-path variant (e.g. the warehouse's pending-file list). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    records(spark.read.option("lineSep", "$$$$").text(paths: _*))

  /** Record normalization over an already-opened `$$$$`-delimited
    * text frame — shared by the batch read and the streaming ingest
    * ([[graft.sinks.Warehouse.ingestStream]]), so both paths parse
    * byte-identically. Works on batch and streaming frames alike
    * (pure narrow projections). */
  def records(raw: DataFrame): DataFrame =
    raw.select(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("value"), "'", ""),
            "\\A\n", ""),
          "\n\\z", "").as("sdf"),
        input_file_name().as("src_file"))
      .withColumn("cid", cidOf(col("sdf")))
      .filter(col("cid").isNotNull)

  /** CID extraction — the reference's record-identifying regex
    * (utils.py:265: `<PUBCHEM_COMPOUND_CID>\n([0-9]+)`). */
  def cidOf(sdf: Column): Column =
    nullIfEmpty(regexp_extract(sdf, "<PUBCHEM_COMPOUND_CID>\n([0-9]+)", 1))
      .cast(LongType)

  private def nullIfEmpty(c: Column): Column = when(length(c) > 0, c)

  /** Value of one SD tag block: the line after a line that is
    * *exactly* `> <TAG>` (the reference requires exact line equality
    * — utils.py:102). Returns null when the tag is absent. */
  def tagValue(sdf: Column, tag: String): Column = {
    val pattern = "(?m)^" + java.util.regex.Pattern.quote(s"> <$tag>") + "\n([^\n]*)"
    nullIfEmpty(regexp_extract(sdf, pattern, 1))
  }

  /** One extracted column: first matching tag in SD_TAG priority
    * order wins. DELIBERATE divergence from the reference, whose
    * file-order scan lets every matching block overwrite so the LAST
    * tag in the record wins (utils.py:95-107): priority order makes
    * the layout, not record byte layout, decide — and the two agree
    * on real PubChem data, where these tags are mutually exclusive
    * per record (pinned either way by SdfSpec "tag priority
    * pinned"). Then cast to the declared dtype (utils.py:37
    * `_as_dtype`), the CREATE_LIKE transform (utils.py:107), and a
    * final cast so the output type is stable even for type-changing
    * transforms. */
  def extractColumn(sdf: Column, spec: ColumnSpec): Column = {
    val raw = coalesce(spec.sdTags.map(t => tagValue(sdf, t)): _*)
    val typed = raw.cast(spec.sparkType)
    val transformed = spec.createLike.fold(typed)(_(typed))
    transformed.cast(spec.sparkType).as(spec.name)
  }

  /** Layout-driven extraction of a read SDF frame: one projection,
    * all columns, fully codegen'd. No NOT_NULL filtering here —
    * mirror of `extract_info_from_sdf`. */
  def extract(sdfDf: DataFrame, layout: LayoutSpec): DataFrame =
    sdfDf.select(layout.columns.map(c => extractColumn(col("sdf"), c)): _*)

  /** Rows missing any NOT_NULL column are dropped — mirror of the
    * reference's skip logic (utils.py:148-155). `na.drop` is a plain
    * IsNotNull filter, so it pushes past the projection. */
  def filterNotNull(extracted: DataFrame, layout: LayoutSpec): DataFrame =
    if (layout.notNullColumns.isEmpty) extracted
    else extracted.na.drop("any", layout.notNullColumns)

  /** End-to-end: SDF directory/glob → compounds table per layout.
    * The Spark twin of build_db's per-file loop (utils.py:316-324),
    * minus the sink (see graft.sinks). */
  def compounds(spark: SparkSession, path: String, layout: LayoutSpec = LayoutSpec.default): DataFrame =
    filterNotNull(extract(read(spark, path), layout), layout)
}
