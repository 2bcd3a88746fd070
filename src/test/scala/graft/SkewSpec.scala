package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted join equals the plain join on a skewed dataset") {
    import spark.implicits._
    // 10k rows on one hot key + a long tail
    val left = spark.range(0, 10000)
      .select(when(col("id") < 9000, lit(1L)).otherwise(col("id")).as("k"), col("id").as("payload"))
    val right = Seq((1L, "hot"), (9500L, "tail"), (424242L, "no-match")).toDF("k", "name")

    val plain = left.join(right, "k").select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", salts = 8).select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.length == 9001)
  }

  test("salted join spreads a hot key of IDENTICAL rows over all sub-keys") {
    import spark.implicits._
    // bit-identical rows — the case a row-hash salt cannot spread
    val left = spark.range(0, 10000).select(lit(1L).as("k"), lit("same").as("payload"))
    val right = Seq((1L, "hot")).toDF("k", "name")
    val saltCount = left.withColumn("__salt", operators.Skew.saltCol(8, 42L))
      .select("__salt").distinct().count()
    assert(saltCount == 8, s"expected the hot key split into 8 sub-keys, got $saltCount")
    assert(Skew.saltedJoin(left, right, "k", 8).count() == 10000)
  }

  test("salted join rejects inputs that already carry a __salt column") {
    import spark.implicits._
    val l = Seq((1L, 0L)).toDF("k", "__salt")
    val r = Seq((1L, "x")).toDF("k", "name")
    assertThrows[IllegalArgumentException](Skew.saltedJoin(l, r, "k", 4))
  }

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    val df = spark.range(0, 5000)
      .select(when(col("id") < 4500, lit(7L)).otherwise(col("id") % 13).as("k"),
        (col("id") % 97).cast("double").as("v"))
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    val saltedAgg = Skew.saltedCountSum(df, "k", "v", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(saltedAgg == direct)
  }
}
