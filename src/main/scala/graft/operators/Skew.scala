package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §6: "salt-ready").
  *
  * First line of defense is AQE's skew-join splitting, enabled in
  * every GraftSession. Salting is the explicit fallback for the
  * cases AQE can't fix — e.g. a single hot key whose build side
  * must be replicated, or aggregations upstream of the join.
  */
object Skew {

  /** Equi-join with the left (large, skewed) side salted into
    * `salts` sub-keys and the right side replicated once per salt.
    * The left salt is a deterministic hash of the full row — no rand(),
    * so the plan stays re-executable (task retries, speculative
    * execution, and AQE re-optimization all re-derive identical
    * salts). Output equals the plain equi-join, but the hot key's
    * rows spread over `salts` shuffle partitions. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salts.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on
    * (key, salt), then final aggregate on key. For algebraic
    * aggregates this is what Spark's partial aggregation already
    * does; the explicit form exists for aggregations where the
    * per-key state is large (collect-like) and one reducer would
    * otherwise hold the whole hot key. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(salts.toLong)))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
  }
}
