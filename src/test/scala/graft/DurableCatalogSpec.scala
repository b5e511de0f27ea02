package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The Generations protocol proven on a catalog that OUTLIVES the
  * writer (the r11 verdict's #1 structural finding: every
  * crash-atomicity claim previously lived in the in-memory session
  * catalog that dies with the JVM, and the crash specs simulated
  * crashes within a surviving JVM). This spec forks REAL JVMs over one
  * shared Derby-backed Hive metastore and kills them mid-swap with
  * `Runtime.halt` — before-flip and after-flip — then reattaches a
  * fresh JVM and asserts probe hash-integrity, lease recovery via the
  * TTL path, debris GC, and the in-process crash matrix, all against
  * the persistent catalog. The command semantics live in
  * [[graft.tools.DurableLab]]; this spec drives the process sequence
  * and asserts exit codes (137 = halted mid-swap, 0 = recovery
  * assertions all passed in the forked JVM). */
class DurableCatalogSpec extends AnyFunSuite {

  private val AddOpens = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))

  private def fork(workDir: String, cmd: String): (Int, String) = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val args = Seq(javaBin) ++ AddOpens ++ Seq(
      "-Xmx3g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.DurableLab", cmd, workDir)
    val log = Paths.get(workDir, s"$cmd.log").toFile
    val pb = new ProcessBuilder(args: _*)
      .redirectErrorStream(true)
      .redirectOutput(log)
    val p = pb.start()
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); sys.error(s"$cmd timed out") }
    val out = new String(Files.readAllBytes(log.toPath), "UTF-8")
    (p.exitValue(), out)
  }

  private def tail(out: String): String =
    out.linesIterator.toSeq.takeRight(25).mkString("\n")

  test("kill-mid-swap on a persistent metastore: both windows recover with probe hash-integrity and TTL lease recovery") {
    val workDir = Files.createTempDirectory("graft_durable").toString
    def run(cmd: String, expectRc: Int): String = {
      val (rc, out) = fork(workDir, cmd)
      assert(rc == expectRc,
        s"$cmd: expected exit $expectRc, got $rc\n${tail(out)}")
      out
    }
    // 1. a fresh JVM builds the family on the durable catalog
    val b = run("build", 0)
    assert(b.contains("[lab] build ok"), tail(b))
    // 2. a mutation is KILLED (halt, not exception) before its flip
    run("kill-before-flip", 137)
    // 3. a fresh JVM reattaches: old state fully visible, dead lease
    //    stealable via TTL, retried mutation completes
    val r1 = run("recover-before", 0)
    assert(r1.contains("[lab] recover-before ok"), tail(r1))
    // 4. a compaction is KILLED right after its atomic flip+release
    run("kill-after-flip", 137)
    // 5. fresh JVM: new generation live, lease already released,
    //    debris GC'd by the next mutation, probe hash intact; then the
    //    in-process crash matrix re-runs on the persistent catalog
    val r2 = run("recover-after", 0)
    assert(r2.contains("[lab] recover-after ok"), tail(r2))
    // 6./7. the RESURRECTION window on the near-dup family (the lex
    //    family's kill pair, replayed against different bookkeeping:
    //    sigs-presence classification instead of a batch-id fence):
    //    batch ingested, taken down, maintenance runs to COMPLETION —
    //    purge, clearApplied, erased registry — and the JVM dies
    //    before the stream checkpoint commits. A fresh JVM replays the
    //    same batch: barred by the registry alone, fingerprint intact;
    //    explicit readmit + recrawl restores the appended state.
    run("nd-kill-post-clear", 137)
    val r3 = run("nd-recover-replay", 0)
    assert(r3.contains("[lab] nd-recover-replay ok"), tail(r3))
  }

  test("ANN cells+model family: kill-mid-retrain both windows — members move as one unit cross-process") {
    val workDir = Files.createTempDirectory("graft_durable_ann").toString
    def run(cmd: String, expectRc: Int): String = {
      val (rc, out) = fork(workDir, cmd)
      assert(rc == expectRc,
        s"$cmd: expected exit $expectRc, got $rc\n${tail(out)}")
      out
    }
    // 1. build the nCells=16 family + the retrain target's expected
    //    fingerprint (a twin nCells=8 build — the trainer is
    //    deterministic, so retrain must land exactly this)
    val b = run("ann-build", 0)
    assert(b.contains("[lab] ann-build ok"), tail(b))
    // 2. a retrain (16 → 8: structurally different model, so any
    //    cells/model generation mix flips the probe fingerprint) is
    //    KILLED before its flip
    run("ann-kill-before-flip", 137)
    // 3. fresh JVM: old cells still score under old centroids
    //    (fingerprint bit-identical), dead lease stealable via TTL,
    //    retried retrain lands the clean nCells=8 state
    val r1 = run("ann-recover-before", 0)
    assert(r1.contains("[lab] ann-recover-before ok"), tail(r1))
    // 4. the retrain back to 16 is KILLED right after its atomic flip
    run("ann-kill-after-flip", 137)
    // 5. fresh JVM: new cells AND new model live together (stamp vs
    //    centroid count agree), lease released by the same call,
    //    debris GC'd, then the in-process throw matrix re-proves both
    //    windows on the persistent catalog
    val r2 = run("ann-recover-after", 0)
    assert(r2.contains("[lab] ann-recover-after ok"), tail(r2))
    // 6./7. the RESURRECTION window on the vec-keyed family: the ANN
    //    append classifies admission by cells-presence, so after an
    //    erasure compaction a replayed batch finds its vecs code-less
    //    and would re-encode them. Kill after full maintenance
    //    (tombstone + purge + clearApplied + erased registry), before
    //    the stream checkpoint would commit; a fresh JVM's replay is
    //    barred by the registry alone, and explicit readmit +
    //    re-encode restores the appended-state fingerprint.
    run("ann-kill-post-clear", 137)
    val r3 = run("ann-recover-replay", 0)
    assert(r3.contains("[lab] ann-recover-replay ok"), tail(r3))
  }

  test("GRAPH four-member family: post-clear resurrection window — replay barred by the registry alone cross-process") {
    val workDir = Files.createTempDirectory("graft_durable_graph").toString
    def run(cmd: String, expectRc: Int): String = {
      val (rc, out) = fork(workDir, cmd)
      assert(rc == expectRc,
        s"$cmd: expected exit $expectRc, got $rc\n${tail(out)}")
      out
    }
    // the fourth maintained family's kill pair: admission classified
    // by vecs-presence (the applied marker written LAST), the erasure
    // compaction purges every member row touching the ids, and the
    // replayed batch — which would re-land forward AND reverse edges
    // — is barred by the durable erased registry alone; readmit +
    // re-append restores the appended-state fingerprint.
    val b = run("graph-build", 0)
    assert(b.contains("[lab] graph-build ok"), tail(b))
    run("graph-kill-post-clear", 137)
    val r = run("graph-recover-replay", 0)
    assert(r.contains("[lab] graph-recover-replay ok"), tail(r))
  }

  test("LEX append fence windows + erasure-compaction flip: killed appenders replay to convergence cross-process") {
    val workDir = Files.createTempDirectory("graft_durable_lex").toString
    def run(cmd: String, expectRc: Int): String = {
      val (rc, out) = fork(workDir, cmd)
      assert(rc == expectRc,
        s"$cmd: expected exit $expectRc, got $rc\n${tail(out)}")
      out
    }
    // 1. build the four-member family + the replay target (a twin
    //    one-shot build over base ∪ batch — appends must be
    //    behavior-invisible, so a converged replay lands exactly this)
    val b = run("lex-build", 0)
    assert(b.contains("[lab] lex-build ok"), tail(b))
    // 2./3. the append — the one mutation that is NOT a generation
    //    swap: three in-place jobs behind a batch-id fence — is KILLED
    //    after its first job; a fresh JVM asserts the exact wreckage
    //    (postings landed, doclen/fence did not), steals the dead
    //    appender's lease via TTL, and replays the same batch id to
    //    the twin's fingerprint with no duplicate rows and the stats
    //    delta exactly once
    run("lex-kill-after-postings", 137)
    val r1 = run("lex-recover-postings", 0)
    assert(r1.contains("[lab] lex-recover-postings ok"), tail(r1))
    // 4./5. same, killed after the SECOND job (doclen rows owned by
    //    the crashed batch id — the classification a replay relies on)
    run("lex-kill-after-doclen", 137)
    val r2 = run("lex-recover-doclen", 0)
    assert(r2.contains("[lab] lex-recover-doclen ok"), tail(r2))
    // 5b. killed after the THIRD job (the dictionary delta landed, the
    //    stats fence did not): the replay must land everything else
    //    while SKIPPING the already-written delta — a double-counted
    //    delta would corrupt the maintained dictionary forever
    run("lex-kill-after-vocab", 137)
    val r2b = run("lex-recover-vocab", 0)
    assert(r2b.contains("[lab] lex-recover-vocab ok"), tail(r2b))
    // 5c. the member writes run OVERLAPPED, so a crash can leave a
    //    NON-PREFIX subset landed: kill with doclen + the dictionary
    //    delta + the stamps landed but postings MISSING — the replay
    //    must land postings exactly once while skipping the landed
    //    deltas (each member's own fence, no cross-member order)
    run("lex-kill-subset", 137)
    val r2c = run("lex-recover-subset", 0)
    assert(r2c.contains("[lab] lex-recover-subset ok"), tail(r2c))
    // 6./7. the ERASURE COMPACTION (all four members rebuilt in one
    //    swap) killed right after its atomic flip: probe fingerprint
    //    already the base build's (physical + statistical erasure
    //    moved together), members mutually consistent, debris GC'd
    run("lex-kill-compact-flip", 137)
    val r3 = run("lex-recover-compact", 0)
    assert(r3.contains("[lab] lex-recover-compact ok"), tail(r3))
    // 8./9. the RESURRECTION window (r13 advice): maintenance runs to
    //    completion — purge, stats consolidation, clearApplied — and
    //    the JVM dies before the stream checkpoint commits. The
    //    redelivered batch finds neither the fence nor its docs; only
    //    the durable erased registry bars it from re-inserting rows
    //    whose takedown was already physical. Then an explicit
    //    readmit + fresh crawl restores ingestion to the append-parity
    //    fingerprint.
    run("lex-kill-post-clear", 137)
    val r4 = run("lex-recover-replay", 0)
    assert(r4.contains("[lab] lex-recover-replay ok"), tail(r4))
  }

  test("UPDATE window: the one-night replace killed mid-replace and post-night — redelivered nights converge to the clean twin cross-process") {
    val workDir = Files.createTempDirectory("graft_durable_upd").toString
    def run(cmd: String, expectRc: Int): String = {
      val (rc, out) = fork(workDir, cmd)
      assert(rc == expectRc,
        s"$cmd: expected exit $expectRc, got $rc\n${tail(out)}")
      out
    }
    // 1. build twin + real artifact sets; the twin runs the identical
    //    update night CLEANLY and its fingerprint (lexical probe +
    //    corpus ids + registry + shard keys) is the convergence target
    val b = run("upd-build", 0)
    assert(b.contains("[lab] upd-build ok"), tail(b))
    // 2./3. window (a): the replace chain halts at its FIRST
    //    generation flip (tombstones committed, nothing purged — old
    //    versions fully live); a fresh JVM redelivers the same night
    //    and must converge
    run("upd-kill-mid-replace", 137)
    val r1 = run("upd-recover-mid", 0)
    assert(r1.contains("[lab] upd-recover-mid ok"), tail(r1))
    // 4./5. window (b): the night COMPLETES (new versions live) and
    //    the JVM dies before the stream checkpoint commits; the replay
    //    re-runs the replace against the already-updated state — the
    //    both-versions wreckage class — and must converge again
    run("upd-kill-post-night", 137)
    val r2 = run("upd-recover-post", 0)
    assert(r2.contains("[lab] upd-recover-post ok"), tail(r2))
  }
}
