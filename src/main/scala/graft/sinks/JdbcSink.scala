package graft.sinks

import graft.sources.LayoutSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** JDBC sink for reference parity: `compounds` table DDL from the
  * layout, batched distributed insert, post-load index DDL from the
  * WITH_INDEX flags (/root/reference/pubchem2sqlite/utils.py:204
  * `initialize_db`, :334-341 index creation).
  *
  * Tested against embedded Derby (the JDBC engine shipped with
  * Spark); works with any JDBC URL whose driver jar is on the
  * classpath — including sqlite for true drop-in parity. A 100 TB
  * load belongs in the parquet [[Warehouse]]; this sink exists so a
  * reference user keeps their SQL-database workflow.
  */
object JdbcSink {

  /** Column-type OVERRIDES for Spark's `createTableColumnTypes`:
    * only text columns that are indexed (or the primary key) are
    * pinned to a bounded VARCHAR — Derby can't index CLOBs, and
    * `varcharLen` need only cover the longest INDEXED value (the
    * default 1024 is far above InChIKey's 27 chars yet safely under
    * the tested engine's index-key ceiling: Derby aborts CREATE
    * INDEX/insert when a key value exceeds roughly half its 4 KB
    * default page, so a 4096 cap would pass the DDL but fail at
    * runtime on a 2-4 KB value; keys meant for indexing are short
    * identifiers anyway). Every other
    * column keeps the JDBC dialect's native mapping — for strings
    * that is CLOB on Derby / TEXT on SQLite, so unbounded payloads
    * (full InChI / SMILES can exceed any fixed cap) load without
    * truncation or abort, like the reference's typeless SQLite
    * columns. (The option's types are parsed by Spark's SQL parser,
    * which has no CLOB — hence overrides only where a bound is
    * required, not a full DDL.) */
  private val TextDtypes = Set("varchar", "character", "text", "string")
  private val NumericDtypes = Set("integer", "int", "real", "float", "double")

  def columnTypes(layout: LayoutSpec, varcharLen: Int = 1024): String =
    layout.columns.flatMap { c =>
      c.dtype.toLowerCase match {
        // fast-fail on unknown dtypes HERE, before any data moves —
        // a typo'd layout otherwise surfaces as a cryptic post-load
        // engine error (e.g. Derby refusing an index on CLOB)
        case d if !TextDtypes(d) && !NumericDtypes(d) =>
          throw new IllegalArgumentException(s"Invalid dtype: ${c.dtype}.")
        case d if TextDtypes(d) && (c.withIndex || c.primaryKey) =>
          Some(s"${c.name} VARCHAR($varcharLen)")
        case _ => None
      }
    }.mkString(", ")

  /** Dedup on the layout's primary key before insert — the
    * reference's INSERT would abort on a pk conflict (utils.py:158).
    * min(struct(...)) picks the lexicographically smallest full row
    * per key: deterministic under any partitioning. */
  def dedupByPrimaryKey(df: DataFrame, layout: LayoutSpec): DataFrame =
    layout.columns.find(_.primaryKey).map(_.name) match {
      case None => df
      case Some(pk) =>
        val cols = df.columns
        df.groupBy(col(pk).as("__pk"))
          .agg(min(struct(cols.map(col).toSeq: _*)).as("__row"))
          .select(cols.map(c => col(s"__row.$c")).toSeq: _*)
    }

  /** Write `df` to `table` at `url`, then create the layout's
    * indexes. Executors write partition-parallel batches (Spark's
    * JDBC writer); index DDL runs once, after load, like the
    * reference. */
  def write(df: DataFrame, url: String, table: String, layout: LayoutSpec,
            varcharLen: Int = 1024): Unit = {
    val overrides = columnTypes(layout, varcharLen)
    val writer = dedupByPrimaryKey(df, layout)
      .write
      .option("truncate", "false")
      .mode("overwrite")
    (if (overrides.nonEmpty) writer.option("createTableColumnTypes", overrides) else writer)
      .jdbc(url, table, new java.util.Properties)
    // Spark's JDBC writer creates columns as QUOTED identifiers, so
    // they are case-sensitive ("InChIKey", not INCHIKEY) — the index
    // DDL must quote them the same way. The layout's unquoted
    // `createIndexSql` stays as-is for reference-DDL parity.
    withConnection(url) { conn =>
      layout.indexedColumns.foreach { c =>
        conn.createStatement().execute(
          s"""CREATE INDEX "idx_$c" ON $table("$c")""")
      }
    }
  }

  def withConnection[A](url: String)(f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }
}
