package graft
object ExplainDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val rows = operators.Similarity.annRecall(spark, dir).collect()
      rows.foreach(r => println(f"[recall] $dir ${r.getString(0)} ${r.getDouble(3)}%.4f"))
    }
    spark.stop()
  }
}
