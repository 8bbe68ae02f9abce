package graft

/** Driver-side concurrency over INDEPENDENT Spark actions (optimization
  * guide §2.6, "Overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. For a query
  * whose construction runs k independent eager units (the m per-subspace
  * PQ codebook fits, the 3 rolling-origin window fits), submitting them
  * from a small thread pool lets each job's tasks back-fill executor slots
  * freed by another job's straggler tail instead of leaving the session
  * idle between fits. FIFO scheduling (the default) gives exactly the
  * back-fill behavior; 2–4 in flight is plenty.
  *
  * Determinism: this changes SCHEDULING only. Each thunk is an independent
  * seeded computation; results are returned in input order and exceptions
  * propagate to the caller (first failure wins, pool drained). */
object Par {

  def run[A](thunks: Seq[() => A], parallelism: Int = 4): Seq[A] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    try {
      // toVector forces strict submission BEFORE any blocking get — a lazy
      // caller collection (view/LazyList) would otherwise interleave
      // submit with get and silently serialize the work (ADVICE r17)
      val futures = thunks.map(t => pool.submit(
        new java.util.concurrent.Callable[A] { def call(): A = t() })).toVector
      futures.map { f =>
        try f.get()
        catch { // unwrap: callers expect the computation's own exception
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdownNow()
    // NOTE (ADVICE r17): on first failure shutdownNow() only interrupts
    // sibling THREADS — Spark jobs those threads already submitted may run
    // to completion after the exception propagates. Fine for the current
    // call sites (idempotent fits/writes on fail-fast queries); a caller
    // with non-idempotent side effects should run its thunks under
    // sc.setJobGroup and cancel the group on failure.
  }
}
