package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql] SparkSession.internalCreateDataFrame` —
  * the standard escape hatch for operators whose hot path is an
  * `InternalRow`-level `mapPartitions` over `queryExecution.toRdd`
  * (zero per-row object decode) but whose result must re-enter the
  * DataFrame world for composition and presentation sorts. Used by
  * the dedup verify grid: the typed-Dataset cogroup decoded a
  * `Tuple3[Long,Long,Long]` (4 allocations) per candidate row, which
  * at ~4e8 rows per sf10 sweep was ~100 s of GC — the merge now
  * reads `UnsafeRow` primitives in place.
  */
object DatasetBridge {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
