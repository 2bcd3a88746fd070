package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}

import scala.jdk.CollectionConverters._

/** A safe value-transform DSL replacing the reference's
  * `eval()`-ed Python lambdas (CREATE_LIKE in
  * /root/reference/pubchem2sqlite/utils.py:83 — arbitrary code
  * execution, unserializable across executors). Each variant
  * compiles to a pure Catalyst `Column` expression, so transforms
  * run inside WholeStageCodegen on every executor.
  */
sealed trait Transform {
  def apply(c: Column): Column = this match {
    case Transform.SplitFirst(sep) => substring_index(c, sep, 1)
    // Python round() is round-half-even — bround matches it.
    case Transform.RoundHalfEven   => bround(c, 0)
    case Transform.Mul(k)          => c * lit(k)
    case Transform.Pow(k)          => pow(c, lit(k))
    case Transform.Custom(f)       => f(c)
  }
}

object Transform {
  /** Keep the prefix of a string up to (not including) `sep`. */
  final case class SplitFirst(sep: String) extends Transform
  /** Round to nearest integer, ties to even (Python round()). */
  case object RoundHalfEven extends Transform
  final case class Mul(k: Long) extends Transform
  final case class Pow(k: Int) extends Transform
  /** Escape hatch for library users: any Column => Column. */
  final case class Custom(f: Column => Column) extends Transform

  private val LambdaPrefix = """^\s*lambda\s*:?\s*__x\s*:\s*(.*)$""".r
  private val SplitFirstPy = """__x\.split\(\s*'(.*)'\s*\)\[0\]""".r
  private val MulLeftPy    = """(-?\d+)\s*\*\s*__x""".r
  private val MulRightPy   = """__x\s*\*\s*(-?\d+)""".r
  private val RoundPy      = """round\(\s*__x\s*\)""".r
  private val PowPy        = """__x\s*\*\*\s*(\d+)""".r
  private val SplitFirstDsl = """split_first\(\s*'(.*)'\s*\)""".r
  private val MulDsl        = """mul\(\s*(-?\d+)\s*\)""".r
  private val PowDsl        = """pow\(\s*(\d+)\s*\)""".r

  /** Parse a CREATE_LIKE string: our DSL (`split_first('-')`,
    * `round`, `mul(2)`, `pow(2)`) or, for drop-in layout-file
    * compatibility, the reference's documented Python lambda forms
    * (utils.py:83 + tests/unittests_utils.py:166-184). Anything
    * else is rejected — no eval. */
  def parse(s: String): Transform = {
    val body = s match {
      case LambdaPrefix(b) => b.trim
      case other           => other.trim
    }
    body match {
      case SplitFirstPy(sep)  => SplitFirst(sep)
      case SplitFirstDsl(sep) => SplitFirst(sep)
      case RoundPy() | "round" => RoundHalfEven
      case MulLeftPy(k)       => Mul(k.toLong)
      case MulRightPy(k)      => Mul(k.toLong)
      case MulDsl(k)          => Mul(k.toLong)
      case PowPy(k)           => Pow(k.toInt)
      case PowDsl(k)          => Pow(k.toInt)
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported CREATE_LIKE transform: '$other'. Use the DSL " +
            "(split_first/round/mul/pow) or Transform.Custom in code.")
    }
  }
}

/** One output column of the extraction layout — mirrors the fields of
  * the reference's JSON column spec
  * (/root/reference/default_db_layout.json, utils.py:78-89). */
final case class ColumnSpec(
    name: String,
    sdTags: Seq[String],
    dtype: String,
    notNull: Boolean = false,
    primaryKey: Boolean = false,
    withIndex: Boolean = false,
    createLike: Option[Transform] = None) {

  def sparkType: DataType = ColumnSpec.sparkType(dtype)
}

object ColumnSpec {
  /** DTYPE → Spark type, accepting the reference's aliases
    * (utils.py:47-54). Integer maps to LongType: SQLite INTEGER is
    * 64-bit and PubChem CIDs keep growing. */
  def sparkType(dtype: String): DataType = dtype.toLowerCase match {
    case "integer" | "int"                          => LongType
    case "real" | "float" | "double"                => DoubleType
    case "varchar" | "character" | "text" | "string" => StringType
    case other => throw new IllegalArgumentException(s"Invalid dtype: $other.")
  }
}

/** An ordered extraction layout: which SD tags feed which output
  * columns, with dtype casts, transforms and nullability flags. */
final case class LayoutSpec(columns: Seq[ColumnSpec]) {
  require(columns.count(_.primaryKey) <= 1,
    "Primary keys must be defined on a single column.")

  def notNullColumns: Seq[String] = columns.filter(_.notNull).map(_.name)
  def indexedColumns: Seq[String] = columns.filter(_.withIndex).map(_.name)

  /** DDL column list, string-identical to the reference's
    * `get_column_stmt` (utils.py:181-201): dtype written verbatim,
    * `not null` for NOT_NULL or PRIMARY_KEY columns, `primary key`
    * allowed once. */
  def columnStmt: String = columns.map { c =>
    val parts = Seq(c.name, c.dtype) ++
      (if (c.notNull || c.primaryKey) Seq("not null") else Nil) ++
      (if (c.primaryKey) Seq("primary key") else Nil)
    parts.mkString(" ")
  }.mkString(",")

  def createTableSql(table: String): String =
    s"CREATE TABLE IF NOT EXISTS $table($columnStmt)"

  def createIndexSql(table: String): Seq[(String, String)] =
    indexedColumns.map(c => s"idx_$c" -> s"CREATE INDEX idx_$c ON $table($c)")
}

object LayoutSpec {
  /** Parse a layout from the reference's JSON file format
    * (same shape as /root/reference/default_db_layout.json);
    * column order in the document is preserved. */
  def fromJson(json: String): LayoutSpec = {
    val root = new ObjectMapper().readTree(json)
    val colsNode = root.get("columns")
    require(colsNode != null, "layout JSON must have a 'columns' object")
    val cols = colsNode.properties().asScala.toSeq.map { e =>
      val name = e.getKey
      val n = e.getValue
      ColumnSpec(
        name = name,
        sdTags = n.get("SD_TAG").elements().asScala.map(_.asText()).toSeq,
        dtype = n.get("DTYPE").asText(),
        notNull = Option(n.get("NOT_NULL")).exists(_.asBoolean(false)),
        primaryKey = Option(n.get("PRIMARY_KEY")).exists(_.asBoolean(false)),
        withIndex = Option(n.get("WITH_INDEX")).exists(_.asBoolean(false)),
        createLike = Option(n.get("CREATE_LIKE")).map(t => Transform.parse(t.asText())))
    }
    LayoutSpec(cols)
  }

  def fromFile(path: String): LayoutSpec =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** The default PubChem compounds layout — programmatic mirror of
    * /root/reference/default_db_layout.json. */
  val default: LayoutSpec = LayoutSpec(Seq(
    ColumnSpec("cid", Seq("PUBCHEM_COMPOUND_CID"), "integer",
      notNull = true, primaryKey = true),
    ColumnSpec("InChI", Seq("PUBCHEM_IUPAC_INCHI"), "varchar", notNull = true),
    ColumnSpec("InChIKey", Seq("PUBCHEM_IUPAC_INCHIKEY"), "varchar",
      notNull = true, withIndex = true),
    ColumnSpec("InChIKey_1", Seq("PUBCHEM_IUPAC_INCHIKEY"), "varchar",
      notNull = true, withIndex = true,
      createLike = Some(Transform.SplitFirst("-"))),
    ColumnSpec("SMILES_CAN", Seq("PUBCHEM_OPENEYE_CAN_SMILES"), "varchar", notNull = true),
    ColumnSpec("SMILES_ISO", Seq("PUBCHEM_OPENEYE_ISO_SMILES"), "varchar", notNull = true),
    ColumnSpec("xlogp3", Seq("PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"), "real"),
    ColumnSpec("exact_mass", Seq("PUBCHEM_EXACT_MASS"), "real",
      notNull = true, withIndex = true),
    ColumnSpec("molecular_formula", Seq("PUBCHEM_MOLECULAR_FORMULA"), "varchar",
      notNull = true, withIndex = true),
    ColumnSpec("molecular_weight", Seq("PUBCHEM_MOLECULAR_WEIGHT"), "real",
      notNull = true)))
}
