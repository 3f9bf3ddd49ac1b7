package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Scala-access shim: `LiveListenerBus.waitUntilEmpty` is `private[spark]`
  * (public at the bytecode level, used by Spark's own test harnesses for
  * exactly this purpose). Benchmark metric attribution needs the bus
  * drained between queries — listener events post asynchronously, so a
  * snapshot taken right after an action would otherwise credit a query's
  * tail events to the next one.
  */
object ListenerBusDrain {
  /** Block until all queued listener events are dispatched (best-effort:
    * a pathological backlog times out rather than hanging the bench).
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
