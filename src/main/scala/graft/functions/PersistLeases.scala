package graft.functions

import java.util.concurrent.ConcurrentLinkedQueue

/** Registry of unpersist handles for caches created inside operators
  * that return a LAZY frame depending on the cache — the handle can't
  * run before the caller consumes the frame, and the convenience
  * wrappers (`SimHashFamily.calibratedPairs`,
  * `EmbedNearDup.calibratedPairs`, `Curation.leasedPersist`) have no
  * way to hand it back.
  *
  * Two lifetimes (round 19 added scopes — VERDICT r18 #6):
  *
  *  - SESSION leases (the default): handles land on a global queue;
  *    harness loops (Bench, Verify) and long-lived sessions call
  *    [[releaseAll]] at each between-queries point (alongside or
  *    instead of `spark.catalog.clearCache()`). A long-lived session
  *    composing many pipelines WITHOUT a drain point accumulates
  *    pinned frames — that session should use scopes.
  *  - SCOPED leases: [[scoped]] runs a pipeline-construction body
  *    with a fresh [[Scope]] active on the calling thread; every
  *    lease registered during it lands on that scope instead of the
  *    global queue, and `scope.release()` — called once the
  *    pipeline's (possibly lazy) result has been consumed — drains
  *    exactly those leases, never another pipeline's. [[withScope]]
  *    is the eager form for bodies that fully consume their result.
  *
  * Handles are idempotent `unpersist` closures, so a drain racing a
  * concurrent register is safe — the late handle just waits for the
  * next drain. Scope activation is thread-local: leases registered by
  * executor-side code (there are none — persist() is driver-side) or
  * by other driver threads stay on the global queue.
  */
object PersistLeases {
  private val leases = new ConcurrentLinkedQueue[() => Unit]()
  private val active = new ThreadLocal[Scope]()

  /** A pipeline-lifetime lease holder: drains its own leases on
    * [[release]] without touching the global queue or other scopes.
    */
  final class Scope private[PersistLeases] () {
    private[PersistLeases] val handles = new ConcurrentLinkedQueue[() => Unit]()

    /** Drain and run this scope's handles (oldest first). Idempotent —
      * handles run once; a second release is a no-op.
      */
    def release(): Unit = {
      var h = handles.poll()
      while (h != null) { h(); h = handles.poll() }
    }

    /** Leases currently held by this scope (test observability). */
    def pending: Int = handles.size()
  }

  /** Register an unpersist handle: on the calling thread's active
    * [[Scope]] when one is open, else on the session-global queue.
    */
  def register(release: () => Unit): Unit = {
    val s = active.get()
    if (s != null) s.handles.add(release)
    else leases.add(release)
    ()
  }

  /** Run `body` with a fresh scope capturing every lease registered
    * on this thread during it; returns (result, scope). The caller
    * invokes `scope.release()` once the (possibly lazy) result has
    * been consumed. Nesting restores the enclosing scope on exit.
    */
  def scoped[T](body: => T): (T, Scope) = {
    val s = new Scope
    val prev = active.get()
    active.set(s)
    try (body, s)
    finally {
      if (prev == null) active.remove() else active.set(prev)
    }
  }

  /** [[scoped]] with an immediate drain — for bodies that fully
    * consume their result (end in an action or a write) before
    * returning.
    */
  def withScope[T](body: => T): T = {
    val (r, s) = scoped(body)
    s.release()
    r
  }

  /** Drain and run every SESSION-scoped handle (oldest first). Leases
    * held by open [[Scope]]s are their owners' to release.
    */
  def releaseAll(): Unit = {
    var h = leases.poll()
    while (h != null) { h(); h = leases.poll() }
  }

  /** Number of currently-held session leases (test observability). */
  def pending: Int = leases.size()
}
