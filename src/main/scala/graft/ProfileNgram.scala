package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev harness: one run of dedup_ngram_jaccard with a stage-level
  * breakdown (executor run time, GC time, shuffle bytes, spill) so
  * regressions can be localized without the UI (disabled in the
  * bench session shape). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows.add(f"stage=${si.stageId}%3d tasks=${si.numTasks}%4d " +
          f"run=${m.executorRunTime / 1e3}%8.1fs gc=${m.jvmGCTime / 1e3}%7.1fs " +
          f"shufRead=${m.shuffleReadMetrics.totalBytesRead / 1e9}%6.2fGB " +
          f"shufWrite=${m.shuffleWriteMetrics.bytesWritten / 1e9}%6.2fGB " +
          f"spillDisk=${m.diskBytesSpilled / 1e9}%6.2fGB " +
          f"name=${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    val entry = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ENTRY", "dedup_ngram_jaccard")
    val warm = sys.env.getOrElse("SPARK_GRAFT_PROFILE_WARMRUNS", "0").toInt
    (1 to warm).foreach { _ =>
      spark.catalog.clearCache()
      SparkEntry.queries(entry)(spark, sfDir).queryExecution.toRdd.count()
    }
    rows.clear()
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(entry)(spark, sfDir)
      .queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    rows.forEach(r => println("[profilengram] " + r))
    println(f"[profilengram] TOTAL wall=$wall%.1fs rows=$n entry=$entry")
    spark.stop()
  }
}
