package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Test-support seam over `SparkContext.listenerBus` (private[spark]):
  * flushing the asynchronous listener bus lets a spec assert on observed
  * job counts deterministically instead of sleeping. Used by
  * `PlanGuardSpec`'s zero-jobs-at-construction guard. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
