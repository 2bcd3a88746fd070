package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.internal.SQLConf

/** Bridge into `SQLConf.withExistingConf` — scoped, thread-local
  * conf overrides for forcing a plan under a non-default setting
  * without mutating the shared session conf. Planner rules read
  * `SQLConf.get`, which consults the thread-local before the active
  * session, so an override scoped here is invisible to concurrent
  * planning on the same session (ADVICE r13: the set/restore dance in
  * `Warehouse.lookupIndexed` could be observed mid-flight by another
  * thread, and the restore wrote an explicit value even when the conf
  * had been unset).
  */
object ConfBridge {
  def withConfOverrides[T](spark: SparkSession, overrides: (String, String)*)(f: => T): T = {
    val cloned = spark.sessionState.conf.clone()
    overrides.foreach { case (k, v) => cloned.setConfString(k, v) }
    SQLConf.withExistingConf(cloned)(f)
  }
}
