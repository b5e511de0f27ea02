package graft.operators

import graft.SparkSpec

/** The two round-9 watch-items on the [[Generations]] swap protocol,
  * made self-enforcing:
  *
  *  - WRITER FENCE: the single-maintenance-writer contract used to be
  *    documentation; now a second concurrent [[Generations.begin]] on
  *    a family fails fast instead of GC'ing the first writer's
  *    half-written generation, and a writer whose lease expired and
  *    was stolen gets a clean error at [[Generations.commit]] instead
  *    of clobbering the thief's swap.
  *  - DEFERRED GC: `commit(gcKeep = n)` keeps the newest n
  *    generations, so a reader that resolved a generation just before
  *    a swap keeps its files for a full further cycle (the documented
  *    long-pause caveat becomes a knob). `gcKeep = 1` is byte-for-byte
  *    today's behavior: storage collapses to one generation.
  *
  * The family here is a toy one driven straight through the
  * Generations API — the maintained-index specs (GenerationsSpec,
  * d12–d14, s09/s16) cover the real families riding the same code. */
class GenerationsLeaseSpec extends SparkSpec {

  private val Members = Seq("state")

  private def writeGen(name: String, gen: Long, v: Long): Unit = {
    import spark.implicits._
    Seq(v).toDF("v").coalesce(1).write.format("parquet")
      .saveAsTable(Generations.physical(name, "state", gen))
  }

  private def genTables(name: String): Seq[String] = {
    val c = spark.sessionState.catalog
    c.listTables(c.getCurrentDatabase, s"${name}_*").map(_.table)
      .filter(_.matches(".*_g\\d+$")).sorted
  }

  test("two interleaved writers: one winner, one clean error") {
    val name = "graft_lease_race"
    Generations.destroy(spark, name, Members)
    val w1 = Generations.begin(spark, name, Members)
    // second writer while w1 is live: fails fast, leaving w1's swap
    // (and any half-written generation) untouched
    val e = intercept[IllegalStateException] {
      Generations.begin(spark, name, Members)
    }
    assert(e.getMessage.contains("concurrent maintenance writer"))
    writeGen(name, w1.gen, 41L)
    Generations.commit(spark, w1, Members)
    assert(Generations.currentGen(spark, name).contains(w1.gen))
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 41L)
    // after the winner committed, the family is free again
    val w3 = Generations.begin(spark, name, Members)
    writeGen(name, w3.gen, 42L)
    Generations.commit(spark, w3, Members)
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 42L)
    Generations.destroy(spark, name, Members)
  }

  test("expired lease of a dead process is stolen; the late commit is refused") {
    val name = "graft_lease_steal"
    Generations.destroy(spark, name, Members)
    // w1's process "dies" holding an already-expired lease
    val w1 = Generations.begin(spark, name, Members, leaseTtlMs = 0L)
    Generations.simulateProcessDeath(name)
    // a foreign lease past its TTL is debris: the next writer steals it
    val w2 = Generations.begin(spark, name, Members)
    writeGen(name, w2.gen, 7L)
    Generations.commit(spark, w2, Members)
    // the zombie's commit cannot clobber the thief's generation
    val e = intercept[IllegalStateException] {
      Generations.commit(spark, w1, Members)
    }
    assert(e.getMessage.contains("lease"))
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 7L)
    Generations.destroy(spark, name, Members)
  }

  test("unexpired foreign lease blocks begin until its TTL passes") {
    val name = "graft_lease_ttl"
    Generations.destroy(spark, name, Members)
    val w1 = Generations.begin(spark, name, Members, leaseTtlMs = 60 * 1000L)
    Generations.simulateProcessDeath(name) // other process, still alive
    val e = intercept[IllegalStateException] {
      Generations.begin(spark, name, Members)
    }
    assert(e.getMessage.contains("another process"))
    // abort from the (still-live) holder releases immediately — but the
    // zombie lease object no longer matches nothing; clean up via the
    // persisted token path: destroy resets the family for other tests
    Generations.destroy(spark, name, Members)
    assert(Generations.currentGen(spark, name).isEmpty)
    // silence the unused warning pattern — w1 is intentionally dead
    assert(w1.name == name)
  }

  // r10 verdict ask #7: the TTL-based cross-process lease fails
  // silently-by-waiting when a foreign JVM dies — leaseStatus is the
  // observable surface that lets an operator tell "stuck behind a dead
  // writer's TTL" from "live writer", across the whole race/steal/TTL
  // matrix; begin additionally LOGS every steal.
  test("leaseStatus distinguishes unheld / live / our-crashed / foreign-live / expired-debris") {
    val name = "graft_lease_status"
    Generations.destroy(spark, name, Members)
    // ensure the manifest exists without leaving a lease behind
    val w0 = Generations.begin(spark, name, Members)
    writeGen(name, w0.gen, 1L)
    Generations.commit(spark, w0, Members)
    // unheld: acquirable, no holder
    val s0 = Generations.leaseStatus(spark, name)
    assert(s0.holder.isEmpty && s0.acquirable)
    // live in this process: visible, NOT acquirable
    val w1 = Generations.begin(spark, name, Members, leaseTtlMs = 60000L)
    val s1 = Generations.leaseStatus(spark, name)
    assert(s1.holder.contains(w1.token))
    assert(s1.liveInThisJvm && s1.issuedByThisJvm && !s1.acquirable)
    assert(s1.heldForMs.exists(_ >= 0L))
    assert(s1.expiresInMs.exists(ms => ms > 0L && ms <= 60000L))
    // our crashed writer (in-process death): dead but ours — the next
    // begin steals without waiting out the TTL
    Generations.simulateWriterCrash(name)
    val s2 = Generations.leaseStatus(spark, name)
    assert(!s2.liveInThisJvm && s2.issuedByThisJvm && s2.acquirable)
    val w1b = Generations.begin(spark, name, Members) // the logged steal
    assert(Generations.leaseStatus(spark, name).holder.contains(w1b.token))
    Generations.abort(spark, w1b)
    // foreign process, unexpired: held and NOT acquirable — the state
    // an operator reads as "wait, or decide the writer is dead"
    val w2 = Generations.begin(spark, name, Members, leaseTtlMs = 60000L)
    Generations.simulateProcessDeath(name)
    val s3 = Generations.leaseStatus(spark, name)
    assert(s3.holder.contains(w2.token))
    assert(!s3.liveInThisJvm && !s3.issuedByThisJvm && !s3.acquirable)
    assert(s3.expiresInMs.exists(_ > 0L))
    intercept[IllegalStateException](Generations.begin(spark, name, Members))
    Generations.destroy(spark, name, Members)
    // foreign process, EXPIRED: debris — acquirable, and begin steals
    val w3 = Generations.begin(spark, name, Members, leaseTtlMs = 0L)
    Generations.simulateProcessDeath(name)
    val s4 = Generations.leaseStatus(spark, name)
    assert(s4.holder.contains(w3.token))
    assert(!s4.liveInThisJvm && !s4.issuedByThisJvm)
    assert(s4.expiresInMs.exists(_ <= 0L) && s4.acquirable)
    val w4 = Generations.begin(spark, name, Members) // the logged steal
    writeGen(name, w4.gen, 9L)
    Generations.commit(spark, w4, Members)
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 9L)
    Generations.destroy(spark, name, Members)
  }

  test("abort releases the lease without flipping the pointer") {
    val name = "graft_lease_abort"
    Generations.destroy(spark, name, Members)
    val w1 = Generations.begin(spark, name, Members)
    writeGen(name, w1.gen, 1L)
    Generations.commit(spark, w1, Members)
    val w2 = Generations.begin(spark, name, Members)
    writeGen(name, w2.gen, 2L) // half-done swap, writer changes its mind
    Generations.abort(spark, w2)
    // pointer never moved; a fresh writer can begin at once and its
    // begin-GC reclaims the aborted debris
    assert(Generations.currentGen(spark, name).contains(w1.gen))
    val w3 = Generations.begin(spark, name, Members)
    assert(w3.gen == w2.gen) // same slot, debris was reclaimed
    writeGen(name, w3.gen, 3L)
    Generations.commit(spark, w3, Members)
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 3L)
    Generations.destroy(spark, name, Members)
  }

  test("gcKeep=2: a reader pinned to the old generation survives the swap") {
    val name = "graft_lease_keep"
    Generations.destroy(spark, name, Members)
    val w1 = Generations.begin(spark, name, Members)
    writeGen(name, w1.gen, 10L)
    Generations.commit(spark, w1, Members, gcKeep = 2)
    // reader resolves NOW — holds the physical gen-N table name across
    // the next swap, the exact long-pause scenario the r9 verdict
    // documents
    val pinned = Generations.resolve(spark, name, "state")
    val w2 = Generations.begin(spark, name, Members)
    writeGen(name, w2.gen, 20L)
    Generations.commit(spark, w2, Members, gcKeep = 2)
    // new readers see gen N+1; the pinned reader still reads gen N
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 20L)
    assert(spark.table(pinned).head().getLong(0) == 10L,
      "pinned reader lost its files despite gcKeep=2")
    assert(genTables(name).size == 2, genTables(name).mkString(","))
    // ...and the keep window slides: another keep=2 swap retains only
    // the newest two, reclaiming gen N
    val w3 = Generations.begin(spark, name, Members)
    writeGen(name, w3.gen, 30L)
    Generations.commit(spark, w3, Members, gcKeep = 2)
    assert(genTables(name).size == 2, genTables(name).mkString(","))
    assert(!spark.sessionState.catalog.tableExists(
      spark.sessionState.sqlParser.parseTableIdentifier(pinned)))
    // dropping back to gcKeep=1 collapses storage to one generation —
    // today's compact footprint, proving 1 is byte-for-byte the old
    // behavior
    val w4 = Generations.begin(spark, name, Members)
    writeGen(name, w4.gen, 40L)
    Generations.commit(spark, w4, Members, gcKeep = 1)
    assert(genTables(name).size == 1, genTables(name).mkString(","))
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 40L)
    Generations.destroy(spark, name, Members)
  }

  test("racing writer threads: every swap wins or fails cleanly, the index never corrupts") {
    val name = "graft_lease_threads"
    Generations.destroy(spark, name, Members)
    val w0 = Generations.begin(spark, name, Members)
    writeGen(name, w0.gen, 0L)
    Generations.commit(spark, w0, Members)
    // two writers race begin/write/commit loops on ONE family; the
    // fence must serialize them — each iteration either completes a
    // full swap or dies with the concurrent-writer error BEFORE
    // touching the live generation
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val fenced = new java.util.concurrent.atomic.AtomicInteger
    val unexpected =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 2).map { t =>
      new Thread(() => {
        (1 to 6).foreach { i =>
          try {
            val w = Generations.begin(spark, name, Members)
            writeGen(name, w.gen, t * 100L + i)
            Generations.commit(spark, w, Members)
            wins.incrementAndGet()
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("concurrent maintenance writer") =>
              fenced.incrementAndGet()
            case e: Throwable => unexpected.add(e)
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(unexpected.isEmpty,
      s"non-fence failure under race: ${unexpected.peek()}")
    assert(wins.get() >= 1, "no writer ever won")
    assert(fenced.get() + wins.get() == 12)
    // the family is intact: one live generation, resolvable, readable,
    // holding the value of SOME completed swap
    assert(genTables(name).size == 1, genTables(name).mkString(","))
    val v = spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0)
    assert(v == 0L || (v >= 101L && v <= 106L) || (v >= 201L && v <= 206L), s"v=$v")
    // and the lease is free afterwards: a fresh writer proceeds
    val w = Generations.begin(spark, name, Members)
    writeGen(name, w.gen, 999L)
    Generations.commit(spark, w, Members)
    assert(spark.table(Generations.resolve(spark, name, "state"))
      .head().getLong(0) == 999L)
    Generations.destroy(spark, name, Members)
  }

  test("begin honors the stamped keep window when reclaiming debris") {
    val name = "graft_lease_begin_keep"
    Generations.destroy(spark, name, Members)
    val w1 = Generations.begin(spark, name, Members)
    writeGen(name, w1.gen, 1L)
    Generations.commit(spark, w1, Members, gcKeep = 2)
    val w2 = Generations.begin(spark, name, Members)
    writeGen(name, w2.gen, 2L)
    Generations.commit(spark, w2, Members, gcKeep = 2)
    assert(genTables(name).size == 2)
    // a later begin must NOT treat the deferred gen N as debris: only
    // generations OUTSIDE the stamped keep window are reclaimed
    val w3 = Generations.begin(spark, name, Members)
    assert(genTables(name).size == 2,
      "begin GC'd a generation inside the stamped keep window")
    Generations.abort(spark, w3)
    Generations.destroy(spark, name, Members)
  }
}
