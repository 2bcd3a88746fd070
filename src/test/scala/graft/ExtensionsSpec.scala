package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Covers the cluster-deployment registration path: a session built
  * with `spark.sql.extensions=graft.functions.GraftExtensions` must
  * expose every native function WITHOUT any graft code running first
  * (no GraftSession, no operator entry points). The shared test
  * session only exercises the registry path, so this builds a fresh
  * SparkSession (reusing the JVM's SparkContext) and restores the
  * shared one afterwards. */
class ExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions config registers every native function in a fresh session") {
    val shared = SparkTestSession.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the builder form of the static
      // `spark.sql.extensions=graft.functions.GraftExtensions` conf
      // (the conf path just Class.forName's the same class into this
      // hook; the static conf itself can't be re-set on a reused
      // test SparkContext)
      val fresh = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new functions.GraftExtensions)
        .getOrCreate()
      assert(fresh ne shared, "builder returned the shared session — extensions path not exercised")
      val row = fresh.sql(
        """SELECT fnv1a64('a') AS h,
          |  vec_dot(array(1D, 2D), array(3D, 4D)) AS d,
          |  vec_sqdist(array(0D), array(3D)) AS sq,
          |  size(graft_shingles('abcdef', 3)) AS ns,
          |  size(graft_word_bigrams('a b c')) AS nb,
          |  size(vec_lsh_sign(array(1D, 2D), 4)) AS nl""".stripMargin).collect()(0)
      assert(row.getLong(0) == functions.Fnv1a64.hash("a"))
      assert(row.getDouble(1) == 11.0)
      assert(row.getDouble(2) == 9.0)
      assert(row.getInt(3) == 4) // abc bcd cde def
      assert(row.getInt(4) == 2) // "a b", "b c"
      assert(row.getInt(5) == 4)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
