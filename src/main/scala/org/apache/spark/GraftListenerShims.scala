package org.apache.spark

/** Bridge to `SparkContext.listenerBus`, which is `private[spark]`.
  * The listener bus is asynchronous: stage-completed events can arrive
  * after the action that produced them returns, so forensics tooling
  * (graft.Profile) must drain the bus before reading per-run listener
  * state or events get attributed to the next run.
  */
object GraftListenerShims {
  def flushListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
