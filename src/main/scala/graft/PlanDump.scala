package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: dump `.explain("formatted")` for registry entries to
  * files, so plan shapes (Exchange count, join strategy, PushedFilters,
  * ReadSchema, codegen spans) can be diffed before/after an
  * optimization without a UI. Usage:
  * `runMain graft.PlanDump /out/dir [name ...]` — no names = all.
  *
  * Plans are captured from the same session shape as Bench (master /
  * shuffle partitions from SPARK_GRAFT_CPUS), so the join-strategy and
  * exchange decisions match what the bench actually runs. Note AQE
  * plans print `isFinalPlan=false` here — this is the static plan;
  * runtime re-optimizations (coalesced reads, broadcast demotions)
  * happen per-execution on top of it.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [entryName ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown entry $name"))
      try {
        val df = fn(spark, sfDir)
        // GRAFT_PLAN_EXECUTED=1: execute the entry first and dump the
        // FINAL AQE plan — the one with ReusedExchange / AQEShuffleRead
        // nodes. The static plan shows duplicated subtrees that AQE's
        // stage cache dedupes at runtime (this repo's shared-exchange
        // idiom relies on that), so only the executed plan is evidence
        // of what actually ran (guide §7.2).
        val txt =
          if (sys.env.get("GRAFT_PLAN_EXECUTED").contains("1")) {
            df.queryExecution.toRdd.count()
            df.queryExecution.executedPlan.toString
          } else df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
          txt.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
