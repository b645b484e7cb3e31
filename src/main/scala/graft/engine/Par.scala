package graft.engine

/** Run independent Spark actions CONCURRENTLY from a small driver-side
  * thread pool (optimization guide §2.6 "overlap independent jobs"):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Used where one build writes several independent
  * artifacts of the same cached input (inverted-list store write, floor
  * calibration, PQ codebook training): each of those is a short job whose
  * tail leaves most cores idle, and on a cluster the next job's tasks
  * back-fill executors freed by the previous job's stragglers.
  *
  * Failure contract: waits for EVERY task to finish even when one fails,
  * then rethrows the FIRST failure in task order — returning early on a
  * concurrent failure would let the caller start deleting its staging
  * directory while a sibling task is still mid-write into it. Task order
  * (not completion order) keeps the propagated error deterministic. */
private[graft] object Par {
  def run(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        })
      }
      // materialize ALL outcomes before rethrowing: every sibling has
      // completed (or failed) by the time control returns to the caller
      val outcomes = futures.map(f => scala.util.Try(f.get()))
      outcomes.collectFirst { case scala.util.Failure(e) =>
        throw (e match {
          case ee: java.util.concurrent.ExecutionException
            if ee.getCause != null => ee.getCause
          case other => other
        })
      }
      ()
    } finally pool.shutdown()
  }
}
