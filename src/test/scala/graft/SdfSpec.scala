package graft

import graft.sources.{ColumnSpec, LayoutSpec, Sdf, Transform}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity specs for the SDF pipeline, reproducing
  * /root/reference/pubchem2sqlite/tests/unittests_utils.py on the
  * same three sample SDF files. */
class SdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sdfDir = sources.SdfQueries.TestSdfDir

  // --- utils.py test_get_column_stmt parity (DDL strings) ---
  test("columnStmt matches the reference DDL rules") {
    assert(LayoutSpec(Seq(
      ColumnSpec("MASS", Nil, "float"),
      ColumnSpec("INCHI", Nil, "string", notNull = true),
      ColumnSpec("CID", Nil, "integer", primaryKey = true))).columnStmt ==
      "MASS float,INCHI string not null,CID integer not null primary key")

    assert(LayoutSpec(Seq(
      ColumnSpec("MASS", Nil, "float"),
      ColumnSpec("INCHI", Nil, "string", notNull = true, primaryKey = true),
      ColumnSpec("CID", Nil, "integer"))).columnStmt ==
      "MASS float,INCHI string not null primary key,CID integer")

    // primary key implies not null even when NOT_NULL is false
    assert(LayoutSpec(Seq(
      ColumnSpec("MASS", Nil, "float"),
      ColumnSpec("INCHI", Nil, "string", primaryKey = true),
      ColumnSpec("CID", Nil, "integer", notNull = true))).columnStmt ==
      "MASS float,INCHI string not null primary key,CID integer not null")

    assertThrows[IllegalArgumentException] {
      LayoutSpec(Seq(
        ColumnSpec("A", Nil, "integer", primaryKey = true),
        ColumnSpec("B", Nil, "integer", primaryKey = true)))
    }
  }

  // --- utils.py test_sdf_molecule_iterator parity (CID sequences) ---
  test("sdf_read yields the reference CID sequence per file") {
    val got = Sdf.read(spark, s"$sdfDir/*.sdf")
      .select(element_at(split(col("src_file"), "/"), -1).as("f"), col("cid"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(
      ("cmps_00_02.sdf", 31038L), ("cmps_00_02.sdf", 31039L), ("cmps_00_02.sdf", 31040L),
      ("cmps_03_05.sdf", 34516L), ("cmps_03_05.sdf", 34517L), ("cmps_03_05.sdf", 34518L),
      ("cmps_06_07.sdf", 46773L), ("cmps_06_07.sdf", 46774L)))
  }

  test("gzip input yields the same records (file-parallel path)") {
    val plain = Sdf.read(spark, s"$sdfDir/*.sdf").select("cid", "sdf").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val gz = Sdf.read(spark, s"$sdfDir/*.sdf.gz").select("cid", "sdf").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(gz == plain)
  }

  // --- utils.py test_data_extraction parity (xlogp3 tag fallback) ---
  val inchis = Map(
    31038L -> "InChI=1S/C18H31NO/c1-2-3-4-5-6-7-8-9-10-11-12-13-18-14-16-19(20)17-15-18/h14-17H,2-13H2,1H3",
    31039L -> "InChI=1S/C11H18O2/c1-2-3-4-5-6-7-8-9-10-11(12)13/h1H,3-10H2,(H,12,13)",
    31040L -> "InChI=1S/C5H6O5.2Na/c6-3(5(9)10)1-2-4(7)8;;/h1-2H2,(H,7,8)(H,9,10);;/q;2*+1/p-2")

  def extractMap(layout: LayoutSpec): Map[Long, org.apache.spark.sql.Row] =
    Sdf.extract(Sdf.read(spark, s"$sdfDir/cmps_00_02.sdf"), layout)
      .collect().map(r => r.getLong(r.fieldIndex("cid")) -> r).toMap

  def xlogpLayout(tags: String*): LayoutSpec = LayoutSpec(Seq(
    ColumnSpec("cid", Seq("PUBCHEM_COMPOUND_CID"), "integer", notNull = true, primaryKey = true),
    ColumnSpec("InChI", Seq("PUBCHEM_IUPAC_INCHI"), "varchar", notNull = true),
    ColumnSpec("xlogp3", tags, "real")))

  test("extraction: both xlogp3 tags → AA fallback fills 6.6") {
    val m = extractMap(xlogpLayout("PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"))
    assert(m.keySet == Set(31038L, 31039L, 31040L))
    inchis.foreach { case (cid, i) => assert(m(cid).getString(1) == i) }
    assert(m(31038L).getDouble(2) == 6.6)
    assert(m(31039L).getDouble(2) == 3.3)
    assert(m(31040L).isNullAt(2))
  }

  test("extraction: only PUBCHEM_XLOGP3 → 31038 has none") {
    val m = extractMap(xlogpLayout("PUBCHEM_XLOGP3"))
    assert(m(31038L).isNullAt(2))
    assert(m(31039L).getDouble(2) == 3.3)
    assert(m(31040L).isNullAt(2))
  }

  test("extraction: only PUBCHEM_XLOGP3_AA → 31039 has none") {
    val m = extractMap(xlogpLayout("PUBCHEM_XLOGP3_AA"))
    assert(m(31038L).getDouble(2) == 6.6)
    assert(m(31039L).isNullAt(2))
    assert(m(31040L).isNullAt(2))
  }

  test("tag priority pinned: a record with BOTH xlogp3 tags resolves by SD_TAG order, not file order") {
    import spark.implicits._
    // The reference's extractor scans tag blocks in FILE order and
    // lets every matching block OVERWRITE the value, so the LAST tag
    // in the record wins (utils.py:95-107). Graft DELIBERATELY
    // diverges: extractColumn coalesces in SD_TAG priority order
    // (Sdf.scala:80), so the first LISTED tag wins wherever it sits
    // in the record — the layout, not record byte order, decides.
    // Real PubChem records carry at most one of these tags, so the
    // engines agree on shipped data; this spec pins the divergence
    // on the synthetic both-tags case.
    val rec = Seq(
      "synthetic", "", "", "M  END",
      "> <PUBCHEM_COMPOUND_CID>", "99999", "",
      "> <PUBCHEM_XLOGP3>", "1.1", "",
      "> <PUBCHEM_XLOGP3_AA>", "9.9", "").mkString("\n")
    val df = Seq(rec).toDF("sdf")
    val priority = Sdf.extract(df, xlogpLayout("PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"))
      .collect()(0)
    assert(priority.getDouble(priority.fieldIndex("xlogp3")) == 1.1,
      "graft semantics: first tag in SD_TAG order wins (reference would take 9.9, the last block)")
    // flipping the layout order flips the winner — the knob is the layout
    val flipped = Sdf.extract(df, xlogpLayout("PUBCHEM_XLOGP3_AA", "PUBCHEM_XLOGP3"))
      .collect()(0)
    assert(flipped.getDouble(flipped.fieldIndex("xlogp3")) == 9.9)
  }

  // --- utils.py test_data_transformation parity (CREATE_LIKE) ---
  test("transforms: 2*cid, InChIKey split, round-half-even") {
    val layout = LayoutSpec(Seq(
      ColumnSpec("cid", Seq("PUBCHEM_COMPOUND_CID"), "integer",
        notNull = true, primaryKey = true, createLike = Some(Transform.parse("lambda __x: 2 * __x"))),
      ColumnSpec("InChIKey", Seq("PUBCHEM_IUPAC_INCHIKEY"), "varchar", notNull = true),
      ColumnSpec("InChIKey_1", Seq("PUBCHEM_IUPAC_INCHIKEY"), "varchar",
        notNull = true, createLike = Some(Transform.parse("lambda: __x: __x.split('-')[0]"))),
      ColumnSpec("xlogp3", Seq("PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"), "real",
        createLike = Some(Transform.parse("lambda __x: round(__x)")))))
    val rows = Sdf.extract(Sdf.read(spark, s"$sdfDir/cmps_00_02.sdf"), layout)
      .collect().map(r => r.getLong(0) -> r).toMap
    val keys = Map(
      62076L -> "JGUZOCJCNMVJHU-UHFFFAOYSA-N", // 2*31038
      62078L -> "OAOUTNMJEFWJPO-UHFFFAOYSA-N",
      62080L -> "YBGBJYVHJTVUSL-UHFFFAOYSA-L")
    assert(rows.keySet == keys.keySet)
    keys.foreach { case (cid, k) =>
      assert(rows(cid).getString(1) == k)
      assert(rows(cid).getString(2) == k.split("-")(0))
    }
    assert(rows(62076L).getDouble(3) == 7.0) // round(6.6)
    assert(rows(62078L).getDouble(3) == 3.0) // round(3.3)
    assert(rows(62080L).isNullAt(3))
  }

  test("transform parse: python-lambda compat and DSL forms agree") {
    assert(Transform.parse("split_first('-')") == Transform.SplitFirst("-"))
    assert(Transform.parse("lambda __x: __x.split('-')[0]") == Transform.SplitFirst("-"))
    assert(Transform.parse("round") == Transform.RoundHalfEven)
    assert(Transform.parse("mul(2)") == Transform.Mul(2))
    assert(Transform.parse("lambda __x: __x ** 2") == Transform.Pow(2))
    assertThrows[IllegalArgumentException](Transform.parse("lambda __x: __import__('os')"))
  }

  // --- utils.py test_db_import parity (NOT_NULL row drops) ---
  def importLayout(xlogpNotNull: Boolean): LayoutSpec = LayoutSpec(Seq(
    ColumnSpec("cid", Seq("PUBCHEM_COMPOUND_CID"), "integer", notNull = true, primaryKey = true),
    ColumnSpec("inchikey", Seq("PUBCHEM_IUPAC_INCHIKEY"), "varchar", notNull = true),
    ColumnSpec("InChI", Seq("PUBCHEM_IUPAC_INCHI"), "varchar", notNull = true),
    ColumnSpec("xlogp3", Seq("PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"), "real",
      notNull = xlogpNotNull)))

  test("pipeline: 8 compounds with nullable xlogp3; reference spot values") {
    val df = Sdf.compounds(spark, s"$sdfDir/*.sdf.gz", importLayout(xlogpNotNull = false))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 8)
    assert(rows(34516L).getString(1) == "SISXGVIKZQKGLA-UHFFFAOYSA-N")
    assert(rows(31038L).getDouble(3) == 6.6)
    assert(rows(31040L).getString(2) == inchis(31040L))
  }

  test("pipeline: NOT_NULL xlogp3 drops to 5 rows, the reference's cids") {
    val cids = Sdf.compounds(spark, s"$sdfDir/*.sdf.gz", importLayout(xlogpNotNull = true))
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(cids.size == 5)
    assert(!cids.contains(34516L) && !cids.contains(31040L) && !cids.contains(46774L))
  }

  // --- oracle-generator tag escaping (ADVICE r5 #2) ---
  test("metacharacter SD tags: Spark matches literally and the DuckDB oracle escapes identically") {
    import spark.implicits._
    // a tag full of regex metacharacters: `.` `+` `(` `)` `[` `]` `*`
    val tag = "X.Y+Z(A)[B]*"
    val record = s"header\n> <$tag>\n42\n\n> <XAYBZCAD[B]E>\n99\n"
    // Spark side: Pattern.quote makes the match literal — the
    // lookalike record (where `.` etc. would match as wildcards)
    // must NOT be picked up
    val df = Seq(record, s"header\n> <XAYBZ(A)[B]C>\n7\n").toDF("sdf")
    val vals = df.select(Sdf.tagValue(col("sdf"), tag).as("v")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(vals.toSeq == Seq("42", null))
    // DuckDB side: the generated pattern escapes every
    // non-[A-Za-z0-9_] char, so both engines match the same literal
    // tag — the two can't silently desync on a metacharacter layout
    val escaped = sources.SdfQueries.duckdbRegexEscape(tag)
    assert(escaped == """X\.Y\+Z\(A\)\[B\]\*""")
    val sql = sources.SdfQueries.duckdbColumn(
      ColumnSpec("xcol", Seq(tag), "integer"))
    assert(sql.contains(escaped) && !sql.contains(s"<$tag>"),
      s"oracle SQL must embed the escaped tag, got:\n$sql")
  }

  // --- layout JSON round-trip against the reference's own file ---
  test("fromFile parses the reference default layout identically to LayoutSpec.default") {
    val parsed = LayoutSpec.fromFile("/root/reference/default_db_layout.json")
    assert(parsed == LayoutSpec.default)
    assert(parsed.columnStmt == LayoutSpec.default.columnStmt)
    assert(parsed.indexedColumns == Seq("InChIKey", "InChIKey_1", "exact_mass", "molecular_formula"))
  }
}
