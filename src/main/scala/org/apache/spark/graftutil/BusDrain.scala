package org.apache.spark.graftutil

import java.util.concurrent.TimeoutException

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus drain.
  *
  * `SparkContext.listenerBus.waitUntilEmpty` is the deterministic way to
  * make sure every posted event (stage completions in particular) has been
  * delivered to registered listeners before a snapshot is read — Spark's own
  * test suites use exactly this call. It is `private[spark]`, so this one
  * object lives under `org.apache.spark` to re-export it; nothing else in
  * the codebase reaches into Spark internals.
  */
object BusDrain {

  /** Block until the listener bus has delivered all queued events, or
    * `timeoutMs` elapses. Returns true when drained, false on timeout —
    * callers treat a timeout as "snapshot may be incomplete", never fatal.
    */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: TimeoutException => false }
}
