package graft.ops

/**
 * Overlap INDEPENDENT Spark actions from a bounded driver thread pool
 * (optimization guide §2.6): Spark's scheduler happily runs several
 * jobs at once inside one application — actions are only sequential
 * because driver code calls them sequentially. The lifecycle gates
 * (q166/q179/q186/q189) and their audits are chains of independent
 * table writes and O(index) audit counts, each of which uses a
 * handful of tasks at a time on local[32]; running them one after
 * another leaves most cores idle for the whole chain. Submitting the
 * independent ones together lets each job's tasks back-fill the
 * executor threads freed by the others' tails.
 *
 * Semantics: this changes WHEN actions run, never what they compute —
 * callers only pass thunks with no data dependencies between them
 * (disjoint output tables / independent counts over already-written
 * inputs). Results return in input order; the first failure rethrows
 * its original cause (not the ExecutionException wrapper) so error
 * classes are unchanged, after all in-flight siblings finish (pool
 * shutdown is awaited — a failed gate must not leave a concurrent
 * write racing the caller's cleanup).
 *
 * FIFO scheduling (the default) is exactly the back-fill behaviour
 * wanted here; the pool is small (≤4) so concurrent jobs fill the
 * stage tails without thrashing the scheduler. Nested use (a
 * parallelized helper called from a parallelized call site) just
 * makes a second small pool — bounded by the call graph, which is
 * two levels deep at most.
 */
private[graft] object Par {
  def run[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, thunks.length))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS)
      ()
    }
  }

  /** Two-result convenience over [[run]]. */
  def run2[A, B](a: () => A, b: () => B): (A, B) = {
    val r = run(Seq(() => a().asInstanceOf[Any], () => b().asInstanceOf[Any]))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
