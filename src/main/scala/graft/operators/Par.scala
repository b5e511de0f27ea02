package graft.operators

/** Overlap independent Spark jobs (optimization guide §2.6): actions
  * are only sequential because driver code calls them sequentially, so
  * independent writes/appends/compactions are submitted from a small
  * thread pool and the scheduler back-fills executors freed by one
  * job's straggler tail with the next job's tasks. This composes with
  * every scale: on local[N] it overlaps the per-job fixed overhead that
  * dominates small fixtures; on a cluster it fills the tail (FIFO
  * scheduling gives exactly the back-fill behavior — the earlier job
  * gets resources first, later jobs use what is left).
  *
  * Safety invariants the call sites must hold (and the ones here do):
  *  - thunks touch DISJOINT tables/paths (per-family generation swaps,
  *    per-member writes inside one swap);
  *  - no thunk depends on another's side effects; steps whose crash
  *    contract is an ORDER may only go through here once that contract
  *    is upgraded to subset states (the lex append's member writes did
  *    exactly that — see appendToLexIndex's in-body argument — while
  *    its stats fence stays strictly after the block);
  *  - threads are created FRESH per call: Spark's job-group/description
  *    local properties are InheritableThreadLocal, so fresh threads
  *    inherit the CALLER's group (the bench watchdog can still cancel a
  *    wedged query's whole group). A reused global pool would pin the
  *    group of whichever query first created the threads and let the
  *    watchdog cancel the wrong query's jobs.
  *
  * Failure: the first thrown exception propagates after all threads
  * finish (no half-started thunk is abandoned running while the caller
  * unwinds a lease).
  */
object Par {

  /** Session-conf knob: max concurrently running thunks (the guide's
    * "2-3 jobs in flight is plenty" — enough to fill the tail, not so
    * many that they fight). 1 disables overlap (sequential fallback,
    * same effects in submission order). */
  val MaxConcurrentConf = "graft.par.maxConcurrent"
  val DefaultMaxConcurrent = 4

  def maxConcurrent(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get(MaxConcurrentConf, DefaultMaxConcurrent.toString).toInt

  /** Run the thunks with at most `width` in flight; rethrow the first
    * failure once every started thunk has finished. Order of side
    * effects across thunks is deliberately unspecified — call sites
    * guarantee independence. */
  def run(spark: org.apache.spark.sql.SparkSession,
      thunks: Seq[() => Unit]): Unit = {
    val width = math.max(1, math.min(maxConcurrent(spark), thunks.size))
    if (width <= 1 || thunks.size <= 1) { thunks.foreach(_()); return }
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
    thunks.foreach(queue.add)
    val firstFailure =
      new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val workers = (1 to width).map { i =>
      val t = new Thread(() => {
        var next = queue.poll()
        while (next != null && firstFailure.get() == null) {
          try next()
          catch { case e: Throwable => firstFailure.compareAndSet(null, e) }
          next = queue.poll()
        }
      }, s"graft-par-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    workers.foreach(_.join())
    val e = firstFailure.get()
    if (e != null) throw e
  }

  /** Reference-counted session-conf override, for the compactions that
    * force bucketed scans (autoBucketedScan=false) around their
    * rewrite bodies. The old save/set/restore pattern raced once
    * compactions of DIFFERENT families overlap (compactAll via
    * [[run]]): thread B could capture thread A's override as the
    * "original" and restore the override permanently. With the
    * counter, the first entrant saves the true original, nested/
    * concurrent entrants stack, and the last exit restores. */
  private val confOverrides =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), (Int, String)]()

  def withConfOverride[T](spark: org.apache.spark.sql.SparkSession,
      key: String, value: String)(body: => T): T = {
    val mapKey = (spark, key)
    confOverrides.synchronized {
      val (depth, saved) = Option(confOverrides.get(mapKey))
        .getOrElse((0, spark.conf.get(key)))
      if (depth == 0) spark.conf.set(key, value)
      confOverrides.put(mapKey, (depth + 1, saved))
    }
    try body
    finally confOverrides.synchronized {
      val (depth, saved) = confOverrides.get(mapKey)
      if (depth <= 1) {
        confOverrides.remove(mapKey)
        spark.conf.set(key, saved)
      } else confOverrides.put(mapKey, (depth - 1, saved))
    }
  }
}
