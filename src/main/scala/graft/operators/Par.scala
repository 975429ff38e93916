package graft.operators

/** Run independent eager-materialization thunks concurrently on a
  * bounded pool — guide §2.6 (overlap independent jobs): Spark's
  * scheduler happily runs several jobs at once inside one application;
  * chains of eager `localCheckpoint(true)` calls are only sequential
  * because the driver code calls them sequentially. Used where a
  * query's construction contains several INDEPENDENT training/peel
  * chains (per-block PQ codebooks, per-k core peels) whose values
  * cannot interact. Results return in INPUT order, so every downstream
  * fold/join order — and therefore every hash-checked value — is
  * unchanged; each chain's internal arithmetic is already
  * partition-order-stable (fixed-point integer sums).
  *
  * A failure in any thunk propagates as-is (ExecutionException
  * unwrapped) — a chain must fail the query loudly, exactly as the
  * sequential form did.
  */
private[operators] object Par {
  def run[A](thunks: Seq[() => A]): Seq[A] =
    if (thunks.lengthCompare(2) < 0) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[A] {
            override def call(): A = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
}
