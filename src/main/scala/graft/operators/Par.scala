package graft.operators

/** Overlap INDEPENDENT driver-side actions — Spark job submissions and
  * FS metadata work — so one action's task tail back-fills the cores the
  * previous action freed (optimization guide §2.6: actions are only
  * sequential because the driver calls them sequentially; the scheduler
  * happily runs several jobs at once). Used where an ingest/compaction
  * step issues several jobs that share NO data dependency and write to
  * DISTINCT paths: the per-table index rewrites of a compaction swap and
  * the non-gate appends of an ingest commit. Callers keep any
  * crash-ordering gate OUTSIDE the parallel group (e.g. hashes/ — the
  * batch commit marker — still lands strictly after the group).
  *
  * r17 receipt: the split-ingest loop ran ~18 serial jobs per micro-batch
  * at 8 shuffle partitions on a 32-core driver box — ≤25% occupancy paid
  * per batch; overlapping the independent jobs cut the index-family
  * stream entries' wall clock at BOTH measured scales (sf0.1 and 100×).
  *
  * Failure contract: waits for ALL actions, then rethrows the FIRST
  * failure (unwrapped). A partially-performed group is exactly the crash
  * window the generation-swap/append protocols already absorb. */
private[graft] object Par {
  def all(fs: (() => Unit)*): Unit = { run(fs.map(f => () => { f(); () })); () }

  /** Run all thunks concurrently, return results in input order. */
  def run[A](fs: Seq[() => A]): Seq[A] = {
    if (fs.isEmpty) return Nil
    if (fs.size == 1) return Seq(fs.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    try {
      val futures = fs.map { f =>
        pool.submit(new java.util.concurrent.Callable[A] { def call(): A = f() })
      }
      var firstFailure: Throwable = null
      var interrupted = false
      val out = futures.map { fut =>
        // An interrupt on the WAITING thread must not abort the
        // wait-for-ALL contract: already-submitted Spark write jobs would
        // keep running while the caller unwinds into its crash-recovery
        // path. Re-enter get() until THIS future settles, record the
        // interrupt, and re-assert the flag for the caller afterwards.
        var res: Option[A] = None
        var settled = false
        while (!settled) {
          try { res = Some(fut.get()); settled = true }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstFailure == null) firstFailure = e.getCause
              settled = true
            case e: java.util.concurrent.CancellationException =>
              if (firstFailure == null) firstFailure = e
              settled = true
            case e: InterruptedException =>
              interrupted = true
              if (firstFailure == null) firstFailure = e
          }
        }
        res
      }
      if (interrupted) Thread.currentThread().interrupt()
      if (firstFailure != null) throw firstFailure
      out.map(_.get)
    } finally pool.shutdownNow()
  }
}
