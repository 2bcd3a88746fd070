package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the z-order DECADE evidence (VERDICT r16 items
  * 3+4): publishes `orders` z-ordered on (o_totalprice,
  * o_orderdate) at a real scale factor and measures the capability's
  * actual 100 TB claims, vs the singly-sorted strawman:
  *
  *   - files TOUCHED (footer min-max stats vs the box predicate) for
  *     a price band, a date band, and the price×date box, per layout
  *   - box-query wall time over each published layout (best of 3)
  *   - APPEND maintenance: appendZOrdered of the fresh 10% slice
  *     (slice-sized) vs a full republish (corpus-sized), then the
  *     same touched/wall numbers on the appended layout, then
  *     reclusterZOrdered and the numbers again
  *
  * Usage: runMain graft.ZOrderScaleBench <sfDir> [files]
  */
object ZOrderScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val files = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    import sinks.ZOrder

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[zscale] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("o_orderdate_us", unix_micros(col("o_orderdate").cast("timestamp")))
    val maxKey = ord.agg(max(col("o_orderkey"))).head.getLong(0)
    val split = maxKey * 9 / 10

    val zdir = s"/tmp/graft_zscale_z_${files}"
    val ldir = s"/tmp/graft_zscale_l_${files}"
    Seq(zdir, ldir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))

    timed("publish_zorder_full")(
      ZOrder.publishZOrdered(ord, "o_totalprice", "o_orderdate_us", zdir, files))
    timed("publish_linear_price")(
      ord.repartitionByRange(files, col("o_totalprice"))
        .sortWithinPartitions(col("o_totalprice"))
        .write.mode("overwrite").parquet(ldir))

    // footer-stats audit: files a pushed predicate cannot skip
    def stats(dir: String): Array[(Double, Double, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("o_totalprice"), max("o_totalprice"),
          min("o_orderdate_us"), max("o_orderdate_us"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    val dLo = java.time.LocalDate.parse(ZOrder.BoxDateLo).toEpochDay * 86400000000L
    val dHi = (java.time.LocalDate.parse(ZOrder.BoxDateHi).toEpochDay + 1) * 86400000000L
    def touched(st: Array[(Double, Double, Long, Long)],
                price: Boolean, date: Boolean): Int =
      st.count { case (plo, phi, dlo, dhi) =>
        (!price || (phi >= ZOrder.BoxPriceLo && plo <= ZOrder.BoxPriceHi)) &&
          (!date || (dhi >= dLo && dlo < dHi))
      }
    def audit(tag: String, dir: String): Unit = {
      val st = stats(dir)
      println(s"[zscale] $tag files=${st.length} " +
        s"touched_price=${touched(st, price = true, date = false)} " +
        s"touched_date=${touched(st, price = false, date = true)} " +
        s"touched_box=${touched(st, price = true, date = true)}")
    }
    audit("layout_zorder", zdir)
    audit("layout_linear", ldir)

    def boxQuery(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("o_totalprice").between(ZOrder.BoxPriceLo, ZOrder.BoxPriceHi) &&
          col("o_orderdate").between(
            lit(ZOrder.BoxDateLo).cast("timestamp_ntz"),
            lit(ZOrder.BoxDateHi).cast("timestamp_ntz")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("sum_price"))
        .queryExecution.toRdd.count()
    for (i <- 1 to 3) timed(s"box_query_zorder_$i")(boxQuery(zdir))
    for (i <- 1 to 3) timed(s"box_query_linear_$i")(boxQuery(ldir))

    // append maintenance: fresh 10% slice, slice-sized vs corpus-sized
    val base = ord.filter(col("o_orderkey") < lit(split))
    val slice = ord.filter(col("o_orderkey") >= lit(split))
    val adir = s"/tmp/graft_zscale_a_${files}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(adir))
    timed("publish_zorder_base90")(
      ZOrder.publishZOrdered(base, "o_totalprice", "o_orderdate_us", adir,
        math.max(files * 9 / 10, 1)))
    timed("append_zorder_slice10")(
      ZOrder.appendZOrdered(slice, "o_totalprice", "o_orderdate_us", adir,
        math.max(files / 10, 1)))
    val nAll = spark.read.parquet(adir).count()
    val nOrd = ord.count()
    assert(nAll == nOrd, s"append lost rows: $nAll vs $nOrd")
    audit("layout_appended", adir)
    for (i <- 1 to 3) timed(s"box_query_appended_$i")(boxQuery(adir))
    timed("recluster_full")(
      ZOrder.reclusterZOrdered(spark, adir, "o_totalprice", "o_orderdate_us", files))
    audit("layout_reclustered", adir)
    for (i <- 1 to 3) timed(s"box_query_reclustered_$i")(boxQuery(adir))

    Seq(zdir, ldir, adir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    spark.stop()
  }
}
