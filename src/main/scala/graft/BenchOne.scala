package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of SparkEntry.queries by name, same
  * methodology as Bench (best-of-3, cache cleared per run). Usage:
  * `runMain graft.BenchOne q1_agg dedup_ngram_jaccard` — iterating on
  * one operator without paying the full-suite bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same default as graft.Bench — the harnesses must build the
    // same session shape or single-query timings don't transfer
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // toRdd.count, not df.count — see Bench.scala: df.count lets
        // Catalyst prune projection-shaped entries to a scan count
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name%-24s best=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
