package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BAND SELF-JOIN profile — the candidate-free form of
  * `q_band_join` (round 18).
  *
  * The bin-join composition (bucket both sides at 2x band width,
  * 3-bin replicate, equi-join, BETWEEN filter) is scalable but pays
  * for every CANDIDATE: at sf1 it evaluates ~48M bin-pair rows to
  * keep ~1.5M in-band matches — a 30x reject ratio that a sort-based
  * engine (DuckDB's IEJoin) never materializes. This operator closes
  * that algorithmic gap while staying distributed:
  *
  *  1. ONE bounded aggregate reads (min, max, count) of the value
  *     column (parquet footer class).
  *  2. Rows hash into equal-width RANGE BUCKETS whose width dwarfs
  *     the band (W >= 4*eps by construction), so a row's entire
  *     +-eps neighborhood lives in its own bucket or an adjacent
  *     one. Rows within eps of a bucket boundary replicate into the
  *     neighbor as GHOSTS (emit = false): they serve as neighbors
  *     there but produce no output row — bounded replication,
  *     2*eps/W of the corpus per side at most.
  *  3. Each bucket sorts by value and a TWO-POINTER kernel computes,
  *     per emit row, the in-band count and the nearest-neighbor gap
  *     in O(rows) — zero candidate rows ever exist. The kernel
  *     evaluates the SAME IEEE comparisons the join form's BETWEEN
  *     does (value >= p - eps, value <= p + eps on the same
  *     doubles), and sorted monotonicity makes the boundary
  *     comparisons decide exactly the per-pair membership — the
  *     pair set, counts, and min-gaps are bit-identical to the
  *     join+filter form (spec-pinned row-for-row, and the DuckDB
  *     oracle is unchanged).
  *
  * Scale shape: one shuffle of (1 + ghost fraction) x corpus rows on
  * the bucket id, an in-partition sort, a linear scan. The output is
  * profile-sized (one row per key with any match), never pair-sized.
  *
  * Sizing contract: bucket count is bounded above by range/(4*eps)
  * (the one-level-ghost invariant) — on data so DENSE that
  * n / maxBuckets rows cannot sit in one task's memory, the
  * candidate-free kernel is the wrong trade and [[selfBandProfile]]
  * FALLS BACK to the caller-supplied join form (the bin composition
  * keeps working at any density; the kernel is the fast path, not a
  * correctness dependency). The fallback line is
  * `graft.band.maxKernelRowsPerBucket` (default 8M rows/bucket).
  */
object Band {

  /** Max mean rows per bucket before the kernel path declines in
    * favor of the join form (a bucket must sort + scan in one task).
    * Override: `graft.band.maxKernelRowsPerBucket`. */
  val MaxKernelRowsPerBucket: Long = 8L * 1000 * 1000

  /** Last routing decision — observability for the spec only. */
  @volatile private[graft] var lastRoute: String = ""

  /** (key, n_similar, min_gap) for every row of `df` whose value
    * column has at least one OTHER row within +-eps. `joinForm` is
    * the dense-data fallback (and the spec's reference). */
  def selfBandProfile(spark: SparkSession, df: DataFrame, keyCol: String,
                      valCol: String, eps: Double,
                      joinForm: => DataFrame): DataFrame = {
    import spark.implicits._
    val outCols = Seq(keyCol, "n_similar", "min_gap")
    val stats = df.agg(min(col(valCol)).cast("double"), max(col(valCol)).cast("double"),
      count(lit(1))).head()
    if (stats.isNullAt(0))
      return Seq.empty[(Long, Long, Double)].toDF(outCols: _*)
    val (lo, hi, n) = (stats.getDouble(0), stats.getDouble(1), stats.getLong(2))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // one-level ghosts need W >= 4*eps; more buckets than tasks is
    // fine (hash distributes bucket runs), fewer only costs
    // parallelism, not correctness
    val maxB = math.max(1L, ((hi - lo) / (4 * eps)).toLong)
    val nb = math.min(math.max(parts.toLong, 1L), maxB).toInt
    val maxPerBucket = spark.conf.getOption("graft.band.maxKernelRowsPerBucket")
      .map(_.toLong).getOrElse(MaxKernelRowsPerBucket)
    if (n / nb > maxPerBucket) { lastRoute = "join"; return joinForm }
    lastRoute = "kernel"
    val w = (hi - lo) / nb
    def bucketOf(v: org.apache.spark.sql.Column) =
      least(greatest(floor((v - lit(lo)) / lit(w)), lit(0.0)), lit((nb - 1).toDouble))
        .cast("int")
    val base = df.select(col(keyCol).cast("long").as("k"), col(valCol).cast("double").as("p"))
      .withColumn("b", bucketOf(col("p")))
      .withColumn("bl", bucketOf(col("p") - lit(eps)))
      .withColumn("bh", bucketOf(col("p") + lit(eps)))
    // home copy always; ghost copies only when the band actually
    // crosses the boundary (bl/bh clamp to b at the range edges)
    val exploded = base.select(col("k"), col("p"), explode(filter(array(
        struct(col("b").as("pid"), lit(true).as("emit")),
        struct(col("bl").as("pid"), lit(false).as("emit")),
        struct(col("bh").as("pid"), lit(false).as("emit"))),
      c => c("emit") || c("pid") =!= col("b"))).as("c"))
    val staged = exploded
      .select(col("c.pid").as("pid"), col("c.emit").as("emit"), col("k"), col("p"))
      .repartition(nb.min(parts * 4), col("pid"))
      .sortWithinPartitions(col("pid"), col("p"), col("k"))
      .as[(Int, Boolean, Long, Double)]
    staged.mapPartitions { it =>
      val all = it.toArray
      val out = Iterator.unfold(0) { start =>
        if (start >= all.length) None
        else {
          var end = start
          val pid = all(start)._1
          while (end < all.length && all(end)._1 == pid) end += 1
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var loI = start
          var hiI = start
          var i = start
          while (i < end) {
            val p = all(i)._4
            if (all(i)._2) {
              // identical IEEE bounds to the join form's BETWEEN
              while (all(loI)._4 < p - eps) loI += 1
              if (hiI < i) hiI = i
              while (hiI < end && all(hiI)._4 <= p + eps) hiI += 1
              val cnt = (hiI - loI - 1).toLong
              if (cnt > 0) {
                var gap = Double.MaxValue
                if (i - 1 >= loI) gap = math.min(gap, p - all(i - 1)._4)
                if (i + 1 < hiI) gap = math.min(gap, all(i + 1)._4 - p)
                buf += ((all(i)._3, cnt, gap))
              }
            }
            i += 1
          }
          Some((buf, end))
        }
      }
      out.flatten
    }.toDF(outCols: _*)
  }
}
