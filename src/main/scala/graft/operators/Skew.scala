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

  /** Salt expression: uniform over [0, salts) including for rows
    * that are bit-identical — a pure row-hash would map duplicate
    * hot-key rows (the canonical skew case after projecting to join
    * columns) to ONE salt and mitigate nothing. rand(seed) is seeded
    * per partition index, so a task retry re-derives the same values
    * for the same input split; a different upstream partitioning
    * yields different salt values, which affects nothing but the
    * spread (join output is salt-value independent). */
  private[graft] def saltCol(salts: Int, seed: Long): org.apache.spark.sql.Column =
    floor(rand(seed) * salts).cast("long")

  /** Equi-join with the left (large, skewed) side salted into
    * `salts` sub-keys and the right side replicated once per salt.
    * Output equals the plain equi-join, but the hot key's rows
    * spread over `salts` shuffle partitions. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
                 seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs must not already have a __salt column")
    val saltedLeft = left.withColumn("__salt", saltCol(salts, seed))
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
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, salts: Int,
                     seed: Long = 42L): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(salts, seed))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
  }
}
