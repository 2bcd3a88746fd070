package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev harness for VERDICT r13 item 2: decompose where the
  * q_events_tumbling / funnel / retention / sample_stratified /
  * dedup_exact sf10 seconds go — scan IO, the ts normalization, the
  * aggregate, the presentation sort — before deciding what plan fix
  * (if any) buys the <2x decade row. Same methodology as BenchOne
  * (best-of-3, toRdd.count). */
object ProfileEvents {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    graft.functions.GraftFunctions.register(spark)
    def ev = Tables.events(spark, sfDir)
    def docs = Tables.documents(spark, sfDir)
    val us = unix_micros(col("ts"))
    val w = 3600L * 1000000
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ev_scan_id" -> (() => ev.select(col("event_id"))),
      "ev_scan_ts_type_val" -> (() => ev.select(col("ts"), col("event_type"), col("value"))),
      "tumb_agg_count_only" -> (() => ev
        .withColumn("bucket_us", us - pmod(us, lit(w)))
        .groupBy(col("bucket_us"), col("event_type"))
        .agg(count(lit(1)).as("n"))),
      "tumb_agg_dsum" -> (() => ev
        .withColumn("bucket_us", us - pmod(us, lit(w)))
        .groupBy(col("bucket_us"), col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("s"))),
      "tumb_agg_doublesum" -> (() => ev
        .withColumn("bucket_us", us - pmod(us, lit(w)))
        .groupBy(col("bucket_us"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))),
      "tumb_entry" -> (() => operators.Relational.qEventsTumbling(spark, sfDir)),
      // the pre-round-16 presentation sort (range exchange with
      // boundary sampling) over the same aggregate — the ABA twin
      // for Present.orderedBounded's claimed saving
      "tumb_agg_dsum_rangesort" -> (() => ev
        .withColumn("bucket_us", us - pmod(us, lit(w)))
        .groupBy(col("bucket_us"), col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("s"))
        .orderBy(col("bucket_us"), col("event_type"))),
      "tumb_agg_dsum_boundedsort" -> (() => graft.Present.orderedBounded(
        ev.withColumn("bucket_us", us - pmod(us, lit(w)))
          .groupBy(col("bucket_us"), col("event_type"))
          .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("s")),
        col("bucket_us"), col("event_type"))),
      "retention_entry" -> (() => operators.Relational.qEventsRetention(spark, sfDir)),
      "funnel_entry" -> (() => operators.Relational.qEventsFunnel(spark, sfDir)),
      "docs_scan_id" -> (() => docs.select(col("doc_id"))),
      "docs_scan_text_md5" -> (() => docs.select(md5(col("text")).as("h"))),
      "dedup_exact_entry" -> (() => operators.Dedup.dedupExact(spark, sfDir)),
      "stratified_entry" -> (() => operators.Curation.sampleStratified(spark, sfDir)))
    variants.foreach { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profileevents] $name%-22s best=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
