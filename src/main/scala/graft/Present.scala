package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Presentation-sort helper for projection-shaped entries (r13).
  *
  * A global `orderBy` plans a range exchange, and computing its
  * bounds SAMPLES the child plan — a full extra execution of
  * whatever sits below. For an aggregate-shaped entry that re-run
  * reads the aggregate's materialized shuffle (cheap); for a
  * projection-shaped entry there is NO exchange below the sort, so
  * the sampling pass re-runs the scan + kernel wholesale. Measured
  * at sf10 (ProfileText): `text_langid` computes in 2.79 s but the
  * entry took 8.09 s; `text_pii` 1.29 vs 3.82 s — the "per-entry
  * scan + sort floor" r12 recorded was mostly this double pass.
  *
  * Fix: one cheap hash exchange of the RESULT rows (kernel outputs,
  * no text column) right below the sort. AQE materializes it once;
  * the range sampling then reads shuffle output instead of
  * re-running the kernel. At warehouse scale the result shuffle is
  * output-row-sized — still the right trade against a second full
  * corpus scan, and a deployment that doesn't need a globally
  * ordered presentation drops the sort entirely.
  */
object Present {
  def ordered(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(keys.head).orderBy(keys: _*)
}
