package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev harness for VERDICT r20 item 1: decompose where each stream
  * entry's seconds go — query start, per-batch planning, state-store
  * commit, sink write, stop — via the StreamingQueryListener progress
  * feed (durationMs per batch) plus wall segments around the entry
  * call. Same methodology as BenchOne (best-of-3, toRdd.count); the
  * progress breakdown is printed for the LAST run. */
object ProfileStreams {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      private def now() = System.nanoTime() / 1e9
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        log.add(f"${now()}%.3f  started ${e.name}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        log.add(f"${now()}%.3f  batch ${p.batchId} rows=${p.numInputRows} $dur")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        log.add(f"${now()}%.3f  terminated")
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("stream_tumbling")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        spark.catalog.clearCache()
        if (i == 3) log.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlan = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t1 = System.nanoTime()
        if (i == 3) log.add(
          f"${t0 / 1e9}%.3f  t0 | entry-fn(incl stream run)=${(tPlan - t0) / 1e9}%.3f s, final count=${(t1 - tPlan) / 1e9}%.3f s")
        (t1 - t0) / 1e9
      }
      println(f"[profilestreams] $name%-26s best=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
      log.forEach(l => println(s"  $l"))
    }
    spark.stop()
  }
}
