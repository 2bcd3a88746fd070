package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact (order-independent) aggregation helpers.
  *
  * Floating-point sums depend on reduction order, which differs
  * between partitions/engines. Casting measures to DECIMAL before
  * aggregating makes every sum exact and therefore bit-identical to
  * the DuckDB oracle regardless of partitioning — crucial both for
  * the correctness gate and for deterministic results at cluster
  * scale. The final cast back to DOUBLE is a deterministic function
  * of the exact decimal, so both engines emit the same double.
  *
  * Decimal aggregation stays inside Spark's partial-aggregation
  * (map-side combine) path, so this costs no extra shuffle.
  */
object Exact {
  /** 6 fractional digits comfortably covers the 2-decimal money /
    * discount columns; 18 total digits keeps products within
    * Spark's 38-digit cap (no silent scale truncation). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Exact sum of a double measure, emitted as double.
    *
    * The ROUND(_, 6) is an identity on this data (inputs have ≤6
    * decimal places, so sums do too) — it normalizes the scale. The
    * decimal→double conversion then goes THROUGH A STRING: the
    * decimal→string step is exact in both engines and the
    * string→double parse is correctly rounded in both (Java
    * parseDouble, DuckDB fast_float), so both emit the double
    * closest to the exact sum AT ANY MAGNITUDE. The direct
    * decimal→double cast is only single-rounded while the scaled
    * integer fits 2^53 — sum_charge crossed that at sf1 (≈4.5e16
    * at scale 6) and the engines drifted a final ulp apart. */
  /** Measured honestly at sf100 (round 14) and kept as-is: the
    * decimal(28,6) sum buffer exceeds Decimal's compact-long range,
    * so every update pays a JavaBigDecimal add — +1.4 s over a plain
    * double sum on 100M rows (44% of q_events_tumbling's wall). A
    * 128-bit-unscaled DeclarativeAggregate (two long buffer words,
    * carry arithmetic in plain long expressions) was built and
    * benchmarked as the replacement and came out 1.7x SLOWER: a
    * declarative aggregate's buffer-update expressions INLINE their
    * child per reference, and the carry math references the
    * unscaled value ~6 times — six double→decimal casts per row
    * where the built-in pays one cast + one BigDecimal add
    * (subexpression elimination does not rescue If-guarded
    * aggregate updates). The imperative escape hatches
    * (TypedImperativeAggregate) forfeit whole-stage codegen for the
    * whole aggregate, which costs more than the decimal adds. The
    * decimal sum is therefore the honest price of cross-engine
    * exactness on this engine. */
  def dsum(c: Column): Column = viaString(round(sum(dec(c)), 6))

  /** Exact sum of an already-decimal expression, emitted as double. */
  def dsumRaw(c: Column): Column = viaString(round(sum(c), 6))

  private def viaString(d: Column): Column =
    d.cast(org.apache.spark.sql.types.StringType).cast(DoubleType)

  /** extendedprice * (1 - discount) as an exact decimal product. */
  def discPrice(ep: Column, disc: Column): Column =
    dec(ep) * (lit(1) - dec(disc))

  /** extendedprice * (1 - discount) * (1 + tax), factored so no
    * intermediate exceeds decimal(38, _) in either engine. */
  def charge(ep: Column, disc: Column, tax: Column): Column = {
    val factor = ((lit(1) - dec(disc)).cast(DecimalType(12, 6)) *
      (lit(1) + dec(tax)).cast(DecimalType(12, 6))).cast(DecimalType(18, 12))
    dec(ep) * factor
  }

  /** SQL fragments for the DuckDB oracle, mirroring the casts above. */
  object sql {
    def sdec(c: String): String = s"CAST($c AS DECIMAL(18,6))"
    def sdsum(c: String): String =
      s"CAST(CAST(ROUND(SUM(${sdec(c)}), 6) AS VARCHAR) AS DOUBLE)"
    /** Wrap an aggregate so its decimal→double conversion is the
      * correctly-rounded string parse (see dsum). */
    def sd(aggExpr: String): String =
      s"CAST(CAST(ROUND($aggExpr, 6) AS VARCHAR) AS DOUBLE)"
    def sdiscPrice(ep: String, disc: String): String =
      s"${sdec(ep)} * (1 - ${sdec(disc)})"
    def scharge(ep: String, disc: String, tax: String): String =
      s"${sdec(ep)} * CAST(CAST((1 - ${sdec(disc)}) AS DECIMAL(12,6)) * " +
        s"CAST((1 + ${sdec(tax)}) AS DECIMAL(12,6)) AS DECIMAL(18,12))"
  }
}
