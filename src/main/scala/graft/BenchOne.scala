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
    // GRAFT_BENCH_JOBS=1: print per-job wall times for the BEST run
    // (guide §1 — find WHERE an entry's seconds go before touching
    // it; with the UI off this listener is the job-level profile)
    val profileJobs = sys.env.get("GRAFT_BENCH_JOBS").contains("1")
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (profileJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, (System.nanoTime(),
            Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(je.jobId)
          if (s != null) jobLog.add(
            f"job ${je.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
        }
        // stage-level: wall vs summed task run time vs GC — separates
        // compute from scheduling stall from memory pressure
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield (a - b) / 1e3).getOrElse(-1.0)
          jobLog.add(f"    stage ${si.stageId}%3d wall=$wall%6.2f run=${m.executorRunTime / 1e3}%7.2f cpu=${m.executorCpuTime / 1e9}%7.2f deser=${m.executorDeserializeTime / 1e3}%6.2f gc=${m.jvmGCTime / 1e3}%5.2f tasks=${si.numTasks}%4d ${si.name.take(60)}")
        }
      })
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    // GRAFT_BENCH_PHASES=1: per-run Catalyst phase wall (analysis /
    // optimization / planning, from QueryPlanningTracker) plus the
    // codegen COMPILE time delta (CodegenMetrics, cumulative JVM-wide
    // histogram) — separates driver plan work from executor work when
    // job walls don't add up to the entry's seconds (guide §1).
    val profilePhases = sys.env.get("GRAFT_BENCH_PHASES").contains("1")
    def compileMs(): Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        spark.catalog.clearCache()
        if (profileJobs && i == 3) jobLog.clear()
        val c0 = if (profilePhases) compileMs() else 0L
        val t0 = System.nanoTime()
        // toRdd.count, not df.count — see Bench.scala: df.count lets
        // Catalyst prune projection-shaped entries to a scan count
        val qe = fn(spark, sfDir).queryExecution
        qe.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (profilePhases) {
          val ph = qe.tracker.phases.map { case (p, s) =>
            f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.3f" }.mkString(" ")
          println(f"  run $i $dt%.3f s  $ph  codegenNewClasses=${compileMs() - c0}")
        }
        dt
      }
      println(f"[benchone] $name%-24s best=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
      if (profileJobs) {
        println(s"[benchone] job breakdown of run 3 (${name}):")
        var (jobs, stages, run, cpu) = (0, 0, 0.0, 0.0)
        jobLog.forEach { l =>
          println(s"  $l")
          if (l.trim.startsWith("job ")) jobs += 1
          else {
            stages += 1
            val rm = "run=\\s*([0-9.]+)".r.findFirstMatchIn(l)
            val cm = "cpu=\\s*([0-9.]+)".r.findFirstMatchIn(l)
            run += rm.map(_.group(1).toDouble).getOrElse(0.0)
            cpu += cm.map(_.group(1).toDouble).getOrElse(0.0)
          }
        }
        println(f"[benchone] $name totals: jobs=$jobs stages=$stages sum_run=$run%.2f sum_cpu=$cpu%.2f")
      }
    }
    spark.stop()
  }
}
