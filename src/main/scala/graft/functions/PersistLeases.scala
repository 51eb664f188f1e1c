package graft.functions

import java.util.concurrent.ConcurrentLinkedQueue

/** Session-scoped registry of unpersist handles for caches created
  * inside operators that return a LAZY frame depending on the cache —
  * the handle can't run before the caller consumes the frame, and the
  * convenience wrappers (`SimHashFamily.calibratedPairs`,
  * `EmbedNearDup.calibratedPairs`) have no way to hand it back.
  *
  * Contract: harness loops (Bench, Verify) and long-lived sessions
  * call [[releaseAll]] at each between-queries point (alongside or
  * instead of `spark.catalog.clearCache()`); callers that manage
  * lifetime explicitly use the `...WithCleanup` variants and never
  * touch this registry. Handles are idempotent `unpersist` closures,
  * so a releaseAll racing a concurrent register is safe — the late
  * handle just waits for the next drain.
  */
object PersistLeases {
  private val leases = new ConcurrentLinkedQueue[() => Unit]()

  def register(release: () => Unit): Unit = leases.add(release): Unit

  /** Drain and run every registered handle (oldest first). */
  def releaseAll(): Unit = {
    var h = leases.poll()
    while (h != null) { h(); h = leases.poll() }
  }

  /** Number of currently-held leases (test observability). */
  def pending: Int = leases.size()
}
