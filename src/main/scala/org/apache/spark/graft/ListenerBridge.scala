package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus` (private[spark]): Bench attributes
  * shuffle-write bytes to individual queries by reading a listener-fed
  * counter between runs, which is only sound if the async listener bus has
  * delivered every event from the run that just finished. `waitUntilEmpty`
  * is the flush; it has no public accessor, hence this declared shim
  * (same technique as [[org.apache.spark.sql.graft.DatasetBridge]]).
  */
object ListenerBridge {
  /** Block until all queued listener events are delivered (best effort:
    * a timeout leaves the counters approximate, never wrong-by-crash). */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
