package org.apache.spark

/** Test-only bridge into `private[spark]` surface: deterministic listener
  * drain so a spec can read listener-accumulated task metrics immediately
  * after an action instead of sleeping and hoping (the listener bus is
  * async; `waitUntilEmpty` blocks until every queued event is delivered).
  */
object GraftTestBridge {
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
