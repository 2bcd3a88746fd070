package graft

import org.apache.spark.sql.functions._

/** Dev harness for the ANN recall ladder (round 19): measure the
  * IVF and LSH legs against the brute oracle at any corpus WITHOUT
  * ann_recall's floor throw, so a failing decade still reports its
  * number (the ladder is the evidence BASELINE records per scale).
  * Usage: `runMain graft.RecallProbe <sfDir> [ivf] [lsh]` — legs
  * default to both. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val legs = if (args.length > 1) args.drop(1).toSet else Set("ivf", "lsh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val t0 = System.nanoTime()
    val brute = operators.Similarity.annTopkBrute(spark, dir)
      .select(col("q_id"), col("vec_id")).localCheckpoint(true)
    val total = brute.count()
    println(f"[recall] brute total=$total in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def leg(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      val matched = df.select(col("q_id"), col("vec_id"))
        .join(brute, Seq("q_id", "vec_id"), "left_semi").count()
      println(f"[recall] $name%-10s ${matched.toDouble / total}%.4f " +
        f"($matched/$total) in ${(System.nanoTime() - t) / 1e9}%.1f s")
    }
    if (legs("ivf")) leg("ivf_probe", operators.Similarity.annIvfProbe(spark, dir))
    if (legs("lsh")) leg("lsh", operators.Similarity.annTopkLsh(spark, dir))
    spark.stop()
  }
}
