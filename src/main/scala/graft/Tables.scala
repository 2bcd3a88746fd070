package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All operators take an `sfDir` so the same code runs at any scale
  * factor — or, on a real cluster, against a warehouse path holding
  * 100 TB of the same schema. Reads are plain parquet scans so
  * Catalyst pushes filters/projections down to the file source.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * map to its µs TimestampType. Read nanos as long and convert with
    * integer division (`div`, not `/` — double division would lose
    * precision at 1e18 ns magnitudes). Values are µs-exact in the
    * generated data, so this equals DuckDB's ns→µs cast.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at
    * session construction by [[GraftSession]]. Only set here as a
    * fallback when absent — not mutated per call (see ADVICE r1). */
  def events(s: SparkSession, d: String): DataFrame = {
    // fallback ONLY when truly unset — an explicit user `false` is
    // respected (the read will then fail loudly, which is correct)
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val AllNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view so users get the
    * reference's actual product — a queryable SQL surface — via
    * `spark.sql(...)`, with the same Catalyst plans as the
    * DataFrame API. */
  def registerViews(s: SparkSession, d: String): Unit = AllNames.foreach {
    case "events" => events(s, d).createOrReplaceTempView("events")
    case n        => table(s, d, n).createOrReplaceTempView(n)
  }
}
