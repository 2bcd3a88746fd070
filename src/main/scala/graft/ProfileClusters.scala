package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the CLUSTERS operator's own decade evidence when its
  * ngram pair SIGNAL cannot be staged on this box (sf100: the exact
  * n-gram sweep's verify-grid shuffle is TB-class against a 252 GB
  * disk — the same documented DNF class as DuckDB's sf10 ngram
  * oracle). Component resolution is pair-graph-sized by design, so
  * its scale behavior is measured over the pair list that DOES
  * compute at sf100 — the minhash near-dup pairs (r14: bit-identical
  * vs DuckDB at 277,845 pairs). Times the staging of the pairs and
  * the label-propagation fixpoint separately.
  *
  * Usage: runMain graft.ProfileClusters <sfDir>
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cpus)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profclusters] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val pairs = timed("stage_minhash_pairs")(
      operators.Dedup.dedupMinhashLshStaged(spark, sfDir))
    val nPairs = pairs.count()
    println(s"[profclusters] pairs=$nPairs")
    val labels = timed("connected_components")(
      operators.Curation.connectedComponents(
          pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
        .select(col("v").as("doc_id"), col("lab").as("cluster_root")))
    val t0 = System.nanoTime()
    val n = labels.queryExecution.toRdd.count()
    println(f"[profclusters] resolve_action              ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println(s"[profclusters] labeled_docs=$n")
    val nComponents = labels.select(col("cluster_root")).distinct().count()
    println(s"[profclusters] components=$nComponents")
    spark.stop()
  }
}
