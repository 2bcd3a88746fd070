package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for VERDICT r12 item 7: decompose where the
  * `text_langid` / `text_pii` sf10 seconds go — scan IO, kernel,
  * presentation sort (whose range-sampling pass re-executes the
  * child), and the full entry. Same methodology as BenchOne
  * (best-of-3, toRdd.count). The stage deltas feed the floor
  * decomposition recorded in BASELINE.md. */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    graft.functions.GraftFunctions.register(spark)
    val st = expr("graft_text_stats(text)")
    val pc = expr("graft_pii_counts(text)")
    def docs = Tables.documents(spark, sfDir)
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan_id_only" -> (() => docs.select(col("doc_id"))),
      "scan_text" -> (() => docs.select(col("doc_id"), length(col("text")).as("l"))),
      "langid_kernel_nosort" -> (() => docs.select(
        col("doc_id"), col("lang"),
        element_at(st, 6).as("de"), element_at(st, 7).as("en"), element_at(st, 8).as("es"),
        element_at(st, 9).as("fr"), element_at(st, 10).as("zh"))),
      "langid_entry" -> (() => operators.TextOps.textLangid(spark, sfDir)),
      "pii_kernel_nosort" -> (() => docs.select(
        col("doc_id"), element_at(pc, 1).as("e"), element_at(pc, 2).as("u"),
        element_at(pc, 3).as("p"))),
      "pii_entry" -> (() => operators.TextOps.textPii(spark, sfDir)))
    variants.foreach { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profiletext] $name%-22s best=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
