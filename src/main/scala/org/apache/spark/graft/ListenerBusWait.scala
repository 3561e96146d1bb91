package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench needs to drain the async listener bus before snapshotting
  * per-query stage metrics; `LiveListenerBus.waitUntilEmpty()` is
  * `private[spark]`, so this one-line accessor lives under the spark
  * package namespace (the standard pattern for test/metrics harnesses
  * that need a deterministic listener flush). */
object ListenerBusWait {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
