package graft.etl

/** Overlap INDEPENDENT eager driver actions (optimization guide §2.6):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Gate rows that build several catalog entries or
  * stores with no data dependency were paying sum-of-latencies for jobs
  * whose tasks never fill the cluster individually (a bounded stats
  * aggregate over a small table leaves most cores idle); submitting them
  * from a small thread pool lets each job's tasks back-fill the others'
  * tails. FIFO scheduling (the default) gives exactly the back-fill
  * behavior; job descriptions stay correct because they are thread-local.
  *
  * Semantics: runs every thunk, waits for ALL to finish (even after a
  * failure — no half-built store is left racing a caller's cleanup), then
  * rethrows the FIRST failure. Parallelism is bounded (default 4 — enough
  * to fill scheduling gaps, not enough to thrash execution memory; the
  * guide's "2-3 jobs in flight is plenty"). Tasks MUST be independent:
  * nothing here orders them, so two writers to one store dir would race
  * the store's lease (which fails loudly — the store contract).
  */
object Overlap {

  def run(tasks: (() => Unit)*): Unit = runAll(tasks, 4)

  def runAll(tasks: Seq[() => Unit], parallelism: Int): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size))
    try {
      val futures = tasks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
      var firstFailure: Option[Throwable] = None
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }
}
