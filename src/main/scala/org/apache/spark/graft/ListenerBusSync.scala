package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-side access to the listener bus drain (`private[spark]`).
  *
  * Per-gate task-CPU attribution reads an accumulator a SparkListener
  * maintains from `onTaskEnd` events; the bus delivers those events
  * asynchronously, so without a drain a gate's last tasks can be credited
  * to the NEXT gate. `waitUntilEmpty()` blocks until every queued event is
  * delivered — called after each gate's action returns, it makes the
  * before/after accumulator reads exact.
  */
object ListenerBusSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
