package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, Dedup, Generations, KnnGraphIndex, LexIndex, Tombstones}

/** CROSS-PROCESS durability lab for the [[Generations]] protocol (the
  * r11 verdict's structural finding): every crash-atomicity claim —
  * the one-call pointer flip, the tombstone emptiness/pending stamps,
  * the writer leases — rides catalog TABLE PROPERTIES, and the
  * in-memory session catalog every spec uses dies with its JVM. This
  * lab runs the SAME protocol against a PERSISTENT metastore
  * (Derby-backed Hive, `enableHiveSupport` — offline-viable, and the
  * same one-atomic-`alterTable` contract a production HMS gives), and
  * injects REAL process death: `Runtime.halt` at the before-flip and
  * after-flip windows, a fresh JVM reattaching afterwards.
  *
  * DurableCatalogSpec forks this main as a sequence of JVMs over one
  * shared metastore directory and asserts the exit codes + state:
  *
  *  1. `build`     — build a near-dup index family + tombstone set,
  *                   record the probe hash.
  *  2. `kill-before-flip` — a tombstone mutation halts (exit 137)
  *                   BEFORE its pointer flip: the merged generation is
  *                   fully written, the pointer must not have moved.
  *  3. `recover-before` — fresh JVM: prior erasure set fully visible,
  *                   probe hash intact, the dead writer's persisted
  *                   lease is expired debris (`leaseStatus.acquirable`
  *                   via the TTL path), and the retried mutation
  *                   steals it and completes.
  *  4. `kill-after-flip` — a compaction halts AFTER its flip: the new
  *                   generation is live AND the lease is already
  *                   released — both moved in the ONE catalog call —
  *                   with the old generation left as unreclaimed
  *                   debris.
  *  5. `recover-after` — fresh JVM: pointer on the new generation,
  *                   probe hash intact, applied-but-uncleared
  *                   tombstones are harmless no-ops, the next
  *                   mutation GCs the debris down to the keep window;
  *                   then the in-process crash matrix (failpoint
  *                   throws) re-runs against the persistent catalog.
  *
  * Protocol delta found and relied on: none — the flip is one
  * `ALTER TABLE SET TBLPROPERTIES`, which HMS applies as a single
  * `alter_table` call, so before/after-flip are the only observable
  * states cross-process too. What the persistent catalog ADDS over
  * the in-memory one is that tables/pointers survive the death, which
  * is exactly what steps 3 and 5 assert (in the in-memory catalog the
  * artifact is gone after a real crash and recovery is re-
  * registration — the reference's JetStream file-storage streams
  * survive a broker kill the same way,
  * `/root/reference/src/nats_client.py:81-102`). */
object DurableLab {

  val IndexName = "lab_nd"
  private val Fixtures = "/root/testdata/sf0.001"
  private val ShortTtlMs = 2000L

  private def session(workDir: String): SparkSession = {
    System.setProperty("derby.system.home", workDir)
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-durable-lab")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$workDir/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
  }

  private def docs(spark: SparkSession) =
    Tables(spark, Fixtures, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)

  /** Deterministic probe: copies of indexed docs 50..69 (must drop —
    * none are ever tombstoned, so mutations elsewhere cannot move
    * this) + three novel docs (must survive). The md5 of the sorted
    * survivor ids is the artifact-integrity fingerprint each recovery
    * compares against the build's. */
  private def probeHash(spark: SparkSession): String = {
    val copies = docs(spark)
      .filter(col("doc_id") >= 50 && col("doc_id") < 70)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(col("text"), lit(" zz probe pad")).as("text"))
    val novel = spark.range(3)
      .select((col("id") + 2000000000L).as("doc_id"),
        concat(lit("durable lab novel probe document "),
          col("id").cast("string"),
          lit(" alpha beta gamma delta epsilon zeta eta theta iota"))
          .as("text"))
    val surv = Dedup.incrementalNearDupSurvivorsIndexed(
        spark, IndexName, copies.unionByName(novel))
      .collect().map(_.getLong(0)).sorted.mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(surv.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def tombSet(spark: SparkSession): Set[Long] =
    Dedup.nearDupTombstones(spark, IndexName)
      .fold(Set.empty[Long])(_.collect().map(_.getLong(0)).toSet)

  private def hashFile(workDir: String) =
    java.nio.file.Paths.get(workDir, "probe_hash.txt")

  private def check(cond: Boolean, msg: String): Unit =
    if (!cond) sys.error(s"DURABLE-LAB ASSERTION FAILED: $msg")

  private def ids(xs: Long*) = {
    val spark = SparkSession.active
    import spark.implicits._
    xs.toDF("doc_id")
  }

  def main(args: Array[String]): Unit = {
    val cmd = args(0)
    val workDir = args(1)
    try {
      run(cmd, workDir)
      println(s"[lab] $cmd ok")
      System.exit(0)
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        System.exit(1)
    }
  }

  private def run(cmd: String, workDir: String): Unit = {
    val spark = session(workDir)
    spark.sparkContext.setLogLevel("WARN")
    val fam = Tombstones.family(IndexName)
    cmd match {
      case "build" =>
        Dedup.writeNearDupIndex(docs(spark), IndexName, numBuckets = 4)
        Dedup.tombstoneNearDup(spark, IndexName, ids(0L, 1L))
        check(tombSet(spark) == Set(0L, 1L), "build tombstone set")
        java.nio.file.Files.write(hashFile(workDir),
          probeHash(spark).getBytes("UTF-8"))

      case "kill-before-flip" =>
        // short-TTL leases so the NEXT process can steal without
        // waiting out the 15-minute production default
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Generations.failpointHalt = true
        Generations.failpoint = Some("before-flip")
        Dedup.tombstoneNearDup(spark, IndexName, ids(2L))
        sys.error("unreachable: the mutation should have halted the JVM")

      case "recover-before" =>
        val stored = new String(
          java.nio.file.Files.readAllBytes(hashFile(workDir)), "UTF-8")
        // the pointer did not move: the prior erasure set is fully
        // visible, nothing half-applied, probes bit-identical
        check(tombSet(spark) == Set(0L, 1L),
          s"erasure set after before-flip kill: ${tombSet(spark)}")
        check(probeHash(spark) == stored, "probe hash after before-flip kill")
        // the dead writer's persisted lease is visible, foreign, and
        // expired — acquirable via the TTL path without any wait left
        Seq(IndexName, fam).foreach { f =>
          val st = Generations.leaseStatus(spark, f)
          check(st.holder.isDefined, s"$f: dead writer's lease vanished")
          check(!st.liveInThisJvm && !st.issuedByThisJvm,
            s"$f: a fresh JVM claims the dead writer's lease")
          check(st.expiresInMs.exists(_ <= 0), s"$f: lease not yet expired")
          check(st.acquirable, s"$f: lease not acquirable after TTL")
        }
        // the retried mutation steals the expired lease and completes
        Dedup.tombstoneNearDup(spark, IndexName, ids(2L))
        check(tombSet(spark) == Set(0L, 1L, 2L), "retried mutation")
        check(probeHash(spark) == stored, "probe hash after retry")

      case "kill-after-flip" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Generations.failpointHalt = true
        Generations.failpoint = Some("after-flip")
        Dedup.compactNearDupIndex(spark, IndexName)
        sys.error("unreachable: the compaction should have halted the JVM")

      case "recover-after" =>
        val stored = new String(
          java.nio.file.Files.readAllBytes(hashFile(workDir)), "UTF-8")
        // the new generation is LIVE: tombstoned rows physically gone
        val bt = Generations.resolve(spark, IndexName, "buckets")
        check(spark.table(bt).filter(col("doc_id").isin(0L, 1L, 2L))
          .count() == 0L, "compacted generation not live after the flip")
        // the lease released IN THE SAME CALL as the flip — a crash
        // between them is impossible by construction, and this is the
        // cross-process observation of it
        check(Generations.leaseStatus(spark, IndexName).holder.isEmpty,
          "lease survived the atomic flip+release")
        // clear() never ran: the applied set is still pending — a
        // harmless no-op (probes anti-join ids whose rows are gone)
        check(tombSet(spark) == Set(0L, 1L, 2L),
          "applied-but-uncleared tombstones lost")
        check(probeHash(spark) == stored, "probe hash after after-flip kill")
        // the crash left the OLD generation unreclaimed — debris the
        // next begin must GC down to the keep window
        def gens() = {
          val c = spark.sessionState.catalog
          c.listTables(c.getCurrentDatabase, s"${IndexName}_buckets_g*").size
        }
        check(gens() == 2, s"expected old-gen debris, found ${gens()} gens")
        Dedup.compactNearDupIndex(spark, IndexName)
        check(gens() == 1, s"debris not GC'd: ${gens()} gens")
        check(Dedup.nearDupTombstones(spark, IndexName).isEmpty,
          "completed compaction did not clear the applied set")
        check(probeHash(spark) == stored, "probe hash after recovery compaction")
        inProcessMatrix(spark, stored)

      // ---- ANN multi-member family (cells + model swap as ONE unit) --
      // The near-dup matrix above kills swaps of a two-table family
      // whose members are independent row sets; the ANN family's
      // members are MUTUALLY INTERPRETING — codes are meaningless
      // under another generation's centroids, and a probe that mixed
      // gen-g cells with gen-g+1 model would silently mis-rank. The
      // kill windows below bracket a RETRAIN (nCells 16 → 8 → 16, so
      // the two generations' models are structurally different and
      // any member mix flips the probe hash, never a silent tie).
      case "ann-build" =>
        AnnIndex.writeAnnIndex(vecs(spark), AnnName, nCells = 16)
        java.nio.file.Files.write(annHashFile(workDir, 16),
          annProbeHash(spark, AnnName).getBytes("UTF-8"))
        // the retrain target's expected state, computed on a twin
        // family: retrain-to-8 must land EXACTLY a fresh nCells=8
        // build (the trainer is order-pinned — the PortableIvf proof)
        AnnIndex.writeAnnIndex(vecs(spark), s"${AnnName}_twin", nCells = 8)
        java.nio.file.Files.write(annHashFile(workDir, 8),
          annProbeHash(spark, s"${AnnName}_twin").getBytes("UTF-8"))

      case "ann-kill-before-flip" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Generations.failpointHalt = true
        Generations.failpoint = Some("before-flip")
        AnnIndex.retrainAnnIndex(spark, AnnName, vecs(spark),
          nCells = Some(8))
        sys.error("unreachable: the retrain should have halted the JVM")

      case "ann-recover-before" =>
        val h16 = annStored(workDir, 16)
        // pointer never moved: the probe resolves gen-g cells WITH
        // gen-g model — the half-written nCells=8 generation's tables
        // exist as debris but are invisible to the resolve, so the
        // hash is bit-identical to the build's (a cells/model mix
        // could not hash to either fingerprint)
        check(annProbeHash(spark, AnnName) == h16,
          "ANN probe hash after before-flip kill")
        val st = Generations.leaseStatus(spark, AnnName)
        check(st.holder.isDefined && !st.issuedByThisJvm &&
          st.expiresInMs.exists(_ <= 0) && st.acquirable,
          s"ANN lease not expired-foreign-acquirable: $st")
        // the retried retrain steals the lease and lands the SAME
        // state a clean nCells=8 build lands
        AnnIndex.retrainAnnIndex(spark, AnnName, vecs(spark),
          nCells = Some(8))
        check(annProbeHash(spark, AnnName) == annStored(workDir, 8),
          "retried retrain != clean nCells=8 build")

      case "ann-kill-after-flip" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Generations.failpointHalt = true
        Generations.failpoint = Some("after-flip")
        AnnIndex.retrainAnnIndex(spark, AnnName, vecs(spark),
          nCells = Some(16))
        sys.error("unreachable: the retrain should have halted the JVM")

      case "ann-recover-after" =>
        // the flip landed: BOTH members moved in the one catalog call,
        // so the probe already scores the new generation's codes under
        // the new generation's centroids — == the original nCells=16
        // build (deterministic trainer), with the old gen as debris
        check(annProbeHash(spark, AnnName) == annStored(workDir, 16),
          "ANN probe hash after after-flip kill")
        check(Generations.leaseStatus(spark, AnnName).holder.isEmpty,
          "ANN lease survived the atomic flip+release")
        // one-unit member consistency, stated on the artifacts: the
        // live cells' nCells stamp equals the live model's centroid
        // count (a gen mix would read 8 vs 16 here)
        val ct = Generations.resolve(spark, AnnName, "cells")
        val mt = Generations.resolve(spark, AnnName, "model")
        val stamped = spark.sessionState.catalog
          .getTableMetadata(spark.sessionState.sqlParser
            .parseTableIdentifier(ct))
          .properties(AnnIndex.NCellsProp).toInt
        val modelCells = spark.table(mt)
          .filter(col("kind") === "cent").count().toInt
        check(stamped == 16 && modelCells == 16,
          s"member mix visible: cells stamp $stamped vs model $modelCells")
        def annGens() = {
          val c = spark.sessionState.catalog
          c.listTables(c.getCurrentDatabase, s"${AnnName}_cells_g*").size
        }
        check(annGens() == 2, s"expected old-gen debris, got ${annGens()}")
        // next mutation's begin GCs the debris down to the keep window
        AnnIndex.compactAnnIndex(spark, AnnName)
        check(annGens() == 1, s"ANN debris not GC'd: ${annGens()}")
        check(annProbeHash(spark, AnnName) == annStored(workDir, 16),
          "ANN probe hash after recovery compaction")
        // in-process matrix (failpoint THROWS) on the persistent
        // catalog: before-flip leaves the old pair serving, after-flip
        // the new pair — never a mix
        Generations.failpoint = Some("before-flip")
        try {
          AnnIndex.retrainAnnIndex(spark, AnnName, vecs(spark),
            nCells = Some(8))
          check(cond = false, "no crash")
        } catch { case _: IllegalStateException => () }
        Generations.failpoint = None
        check(annProbeHash(spark, AnnName) == annStored(workDir, 16),
          "in-process before-flip: old pair not intact")
        Generations.failpoint = Some("after-flip")
        try {
          AnnIndex.retrainAnnIndex(spark, AnnName, vecs(spark),
            nCells = Some(8))
          check(cond = false, "no crash")
        } catch { case _: IllegalStateException => () }
        Generations.failpoint = None
        check(annProbeHash(spark, AnnName) == annStored(workDir, 8),
          "in-process after-flip: new pair not live as one unit")

      // ---- LEX four-member family: the APPEND's fence windows --------
      // The near-dup and ANN matrices kill GENERATION SWAPS (one
      // atomic pointer flip). The lexical index's append is the one
      // mutation in this engine that is NOT a swap: three in-place
      // parquet jobs (postings → doclen → stats) whose atomicity story
      // is replay CONVERGENCE through the batch-id fence, proven
      // in-process by LexIndexSpec's thrown failpoints. Here the same
      // two windows get REAL process death on the persistent catalog:
      // a halted appender leaves half a mutation and a held lease; a
      // fresh JVM must observe exactly the specified wreckage, steal
      // the lease via TTL, and replay the same batch id to a state
      // bit-identical to a clean one-shot build over base ∪ batch.
      case "lex-build" =>
        LexIndex.writeLexIndex(docs(spark), LexName, numBuckets = 4)
        java.nio.file.Files.write(lexHashFile(workDir, "base"),
          lexProbeHash(spark, LexName).getBytes("UTF-8"))
        // the replay target, computed on a twin: a clean ONE-SHOT
        // build over base ∪ batch (appends are behavior-invisible —
        // the s32 contract — so the replayed append must land exactly
        // this), plus its row counts for the exactly-once assertions
        LexIndex.writeLexIndex(
          docs(spark).unionByName(lexAppendBatch(spark)),
          s"${LexName}_twin", numBuckets = 4)
        java.nio.file.Files.write(lexHashFile(workDir, "appended"),
          lexProbeHash(spark, s"${LexName}_twin").getBytes("UTF-8"))
        val twinP = spark.table(Generations.resolve(spark,
          s"${LexName}_twin", "postings")).count()
        val twinL = spark.table(Generations.resolve(spark,
          s"${LexName}_twin", "doclen")).count()
        java.nio.file.Files.write(lexCountsFile(workDir),
          s"$twinP,$twinL".getBytes("UTF-8"))

      case "lex-kill-after-postings" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        LexIndex.appendFailpointHalt = true
        LexIndex.appendFailpoint = Some("after-postings")
        LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
          batchId = LexBatchId, ifAbsent = true)
        sys.error("unreachable: the append should have halted the JVM")

      case "lex-recover-postings" =>
        // window-1 wreckage is exactly as specified: postings landed,
        // doclen, the dictionary delta and the stats fence did not
        check(spark.table(lexMember(spark, "postings"))
          .filter(col("doc_id") >= 2100000000L).count() > 0,
          "postings did not land before the kill")
        check(spark.table(lexMember(spark, "doclen"))
          .filter(col("doc_id") >= 2100000000L).count() == 0,
          "doclen landed before its window")
        check(lexVocabDeltaRows(spark) == 0,
          "vocab delta landed before its window")
        lexCheckFenceAbsentAndReplay(spark, workDir)

      case "lex-kill-after-doclen" =>
        // reset to base (a rebuild defines contents from scratch),
        // then kill the same append in its SECOND window
        LexIndex.writeLexIndex(docs(spark), LexName, numBuckets = 4)
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        LexIndex.appendFailpointHalt = true
        LexIndex.appendFailpoint = Some("after-doclen")
        LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
          batchId = LexBatchId, ifAbsent = true)
        sys.error("unreachable: the append should have halted the JVM")

      case "lex-recover-doclen" =>
        // window-2 wreckage: postings AND doclen landed (owner = this
        // batch id — the classification a replay relies on), the
        // dictionary delta and the stats fence did not
        check(spark.table(lexMember(spark, "postings"))
          .filter(col("doc_id") >= 2100000000L).count() > 0,
          "postings did not land before the kill")
        check(spark.table(lexMember(spark, "doclen"))
          .filter(col("doc_id") >= 2100000000L &&
            col("batch_id") === LexBatchId).count() == 5,
          "doclen rows missing or mis-owned after the second window")
        check(lexVocabDeltaRows(spark) == 0,
          "vocab delta landed before its window")
        lexCheckFenceAbsentAndReplay(spark, workDir)

      case "lex-kill-after-vocab" =>
        // reset to base, then kill the append in its THIRD window:
        // postings + doclen + the dictionary delta landed, the stats
        // fence did not — the replay must SKIP the delta (its batch-id
        // presence check) or the dictionary double-counts forever
        LexIndex.writeLexIndex(docs(spark), LexName, numBuckets = 4)
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        LexIndex.appendFailpointHalt = true
        LexIndex.appendFailpoint = Some("after-vocab")
        LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
          batchId = LexBatchId, ifAbsent = true)
        sys.error("unreachable: the append should have halted the JVM")

      case "lex-recover-vocab" =>
        check(spark.table(lexMember(spark, "doclen"))
          .filter(col("doc_id") >= 2100000000L &&
            col("batch_id") === LexBatchId).count() == 5,
          "doclen rows missing after the third window")
        check(lexVocabDeltaRows(spark) > 0,
          "vocab delta did not land before the kill")
        lexCheckFenceAbsentAndReplay(spark, workDir)
        // the replay wrote the delta ONCE: the maintained dictionary
        // equals the postings-derived one exactly (df, not just counts)
        check(lexDictConsistent(spark), "dictionary != postings after " +
          "the after-vocab replay (delta double-counted or skipped)")

      case "lex-kill-subset" =>
        // reset to base, then kill the append in a NON-PREFIX subset
        // state only the OVERLAPPED member writes can produce: doclen,
        // the dictionary delta AND the stamps landed, postings did NOT
        // — the most adversarial wreckage (every fenced member present,
        // the base member missing); the replay must land postings
        // exactly once while SKIPPING the already-landed deltas
        LexIndex.writeLexIndex(docs(spark), LexName, numBuckets = 4)
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        LexIndex.appendFailpointHalt = true
        LexIndex.appendFailpoint = Some("land-only:doclen,vocab,impacts")
        LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
          batchId = LexBatchId, ifAbsent = true)
        sys.error("unreachable: the append should have halted the JVM")

      case "lex-recover-subset" =>
        check(spark.table(lexMember(spark, "postings"))
          .filter(col("doc_id") >= 2100000000L).count() == 0,
          "postings landed despite the subset window excluding them")
        check(spark.table(lexMember(spark, "doclen"))
          .filter(col("doc_id") >= 2100000000L &&
            col("batch_id") === LexBatchId).count() == 5,
          "doclen rows missing or mis-owned in the subset window")
        check(lexVocabDeltaRows(spark) > 0,
          "vocab delta did not land in the subset window")
        lexCheckFenceAbsentAndReplay(spark, workDir)
        check(lexDictConsistent(spark), "dictionary != postings after " +
          "the subset replay (delta double-counted or skipped)")

      case "lex-kill-compact-flip" =>
        // takedown of the appended docs, then the ERASURE COMPACTION —
        // a four-member swap (postings purged, doclen purged, dfcap
        // and stats REBUILT) — killed right after its atomic flip
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        LexIndex.tombstoneLex(spark, LexName,
          lexAppendBatch(spark).select("doc_id"))
        Generations.failpointHalt = true
        Generations.failpoint = Some("after-flip")
        LexIndex.compactLexIndex(spark, LexName)
        sys.error("unreachable: the compaction should have halted the JVM")

      case "lex-recover-compact" =>
        // the flip landed: all FOUR members moved as one unit, so the
        // probe is already the base build's bit-identical fingerprint
        // (physical AND statistical erasure together — a stale dfcap
        // or stats member would flip it)
        check(lexProbeHash(spark, LexName) == lexStored(workDir, "base"),
          "lex probe hash after after-flip kill")
        check(Generations.leaseStatus(spark, LexName).holder.isEmpty,
          "lex lease survived the atomic flip+release")
        // member mutual consistency, stated on the live artifacts
        check(spark.table(lexMember(spark, "postings"))
          .select("tok").distinct().count() ==
          spark.table(lexMember(spark, "dfcap")).count(),
          "dfcap inconsistent with live postings")
        check(spark.table(lexMember(spark, "doclen")).count() ==
          spark.table(lexMember(spark, "stats"))
            .agg(sum(col("n_docs"))).head().getLong(0),
          "stats inconsistent with live doclen")
        check(lexVocabDeltaRows(spark) == 0,
          "compaction did not reset the dictionary delta member")
        check(lexDictConsistent(spark),
          "compacted dictionary != compacted postings")
        // clear() never ran: applied-but-uncleared tombstones are
        // harmless no-ops (the purged rows are gone)
        check(LexIndex.lexTombstones(spark, LexName).isDefined,
          "pending set vanished with the crash")
        def lexGens() = {
          val c = spark.sessionState.catalog
          c.listTables(c.getCurrentDatabase, s"${LexName}_postings_g*").size
        }
        check(lexGens() == 2, s"expected old-gen debris, got ${lexGens()}")
        LexIndex.compactLexIndex(spark, LexName)
        check(lexGens() == 1, s"lex debris not GC'd: ${lexGens()}")
        check(LexIndex.lexTombstones(spark, LexName).isEmpty,
          "completed compaction did not clear the applied set")
        check(lexProbeHash(spark, LexName) == lexStored(workDir, "base"),
          "lex probe hash after recovery compaction")

      case "lex-kill-post-clear" =>
        // THE resurrection window (r13 advice): batch appended,
        // out-of-band takedown of its docs, nightly maintenance runs
        // to COMPLETION — purge, stats consolidation, clearApplied
        // (pending set cleared, erased registry written) — and the JVM
        // dies BEFORE the stream checkpoint commits. Prior lab steps
        // left registry state behind; reset it so the setup append
        // provably lands (non-vacuity is asserted before the kill).
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Tombstones.destroy(spark, LexName)
        LexIndex.writeLexIndex(docs(spark), LexName, numBuckets = 4)
        LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
          batchId = LexBatchId, ifAbsent = true)
        check(spark.table(lexMember(spark, "doclen"))
          .filter(col("doc_id") >= 2100000000L).count() == 5,
          "setup append did not land — the kill window would be vacuous")
        LexIndex.tombstoneLex(spark, LexName,
          lexAppendBatch(spark).select("doc_id"))
        LexIndex.compactLexIndex(spark, LexName)
        Runtime.getRuntime.halt(137)

      case "lex-recover-replay" =>
        // fresh JVM, at-least-once redelivery of the SAME batch id:
        // the stats fence is consolidated away and the purged docs are
        // absent from doclen — the pre-fix classification would
        // re-admit them. The pending set is already cleared, so only
        // the durable erased registry stands between the replay and a
        // resurrected takedown.
        check(Tombstones.get(spark, LexName).isEmpty,
          "pending set survived the completed maintenance")
        check(Tombstones.erasedSet(spark, LexName)
          .map(_.count()).getOrElse(0L) == 5,
          "erased registry missing after the kill")
        LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
          batchId = LexBatchId, ifAbsent = true)
        check(spark.table(lexMember(spark, "doclen"))
          .filter(col("doc_id") >= 2100000000L).count() == 0,
          "replay resurrected physically erased docs")
        check(lexProbeHash(spark, LexName) == lexStored(workDir, "base"),
          "probe fingerprint moved after the barred replay")
        // re-ingesting erased content is a deliberate act: readmit,
        // then a NEW crawl lands and the family equals the clean
        // one-shot over base ∪ batch (the s32 append-parity target)
        Tombstones.readmit(spark, LexName,
          lexAppendBatch(spark).select("doc_id"))
        LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
          batchId = "lab-recrawl", ifAbsent = true)
        check(lexProbeHash(spark, LexName) == lexStored(workDir, "appended"),
          "readmitted recrawl != clean one-shot build over base ∪ batch")

      // ---- NEAR-DUP resurrection window (r14 verdict #4) --------------
      // lex-kill-post-clear proved the erased-registry bar on the lex
      // family; barReplayed is shared code, but the near-dup append's
      // bookkeeping members differ (sigs is the fully-applied marker,
      // not a batch-id fence), so its post-compaction replay wreckage
      // gets the same real-process-death proof: ingest a batch, take
      // it down, run maintenance to COMPLETION (purge + clearApplied +
      // erased registry), die before the stream checkpoint commits,
      // then replay the same batch from a fresh JVM — barred by the
      // registry alone — and restore ingestion via explicit readmit.
      case "nd-kill-post-clear" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        // earlier matrix steps left tombstone/registry state; reset so
        // the setup append provably lands (non-vacuity asserted below)
        Tombstones.destroy(spark, IndexName)
        val stored = new String(
          java.nio.file.Files.readAllBytes(hashFile(workDir)), "UTF-8")
        check(probeHash(spark) == stored,
          "base fingerprint drifted before the nd kill window")
        Dedup.appendToNearDupIndex(ndKillBatch(spark), IndexName,
          ifAbsent = true)
        val st = Generations.resolve(spark, IndexName, "sigs")
        check(spark.table(st).filter(col("doc_id") >= 2300000000L)
          .count() == 3,
          "setup append did not land — the kill window would be vacuous")
        // the batch docs are exact-text copies of the novel probe docs,
        // so while indexed they flip the fingerprint (novel probes
        // become duplicates) — the discriminating state the replay
        // must NOT be able to restore
        val appended = probeHash(spark)
        check(appended != stored, "nd kill batch does not move the probe")
        java.nio.file.Files.write(ndHashFile(workDir),
          appended.getBytes("UTF-8"))
        Dedup.tombstoneNearDup(spark, IndexName,
          ids(2300000000L, 2300000001L, 2300000002L))
        Dedup.compactNearDupIndex(spark, IndexName)
        Runtime.getRuntime.halt(137)

      case "nd-recover-replay" =>
        val stored = new String(
          java.nio.file.Files.readAllBytes(hashFile(workDir)), "UTF-8")
        // maintenance completed before the death: pending cleared, the
        // durable erased registry holds exactly the batch, rows purged
        check(Tombstones.get(spark, IndexName).isEmpty,
          "pending set survived the completed maintenance")
        check(Tombstones.erasedSet(spark, IndexName)
          .map(_.count()).getOrElse(0L) == 3,
          "erased registry missing after the kill")
        val st = Generations.resolve(spark, IndexName, "sigs")
        check(spark.table(st).filter(col("doc_id") >= 2300000000L)
          .count() == 0, "purge left sig rows behind")
        // at-least-once redelivery: the replayed batch finds its docs
        // sig-less (the pre-fix classification would re-admit) — only
        // the registry bars it
        Dedup.appendToNearDupIndex(ndKillBatch(spark), IndexName,
          ifAbsent = true)
        check(spark.table(st).filter(col("doc_id") >= 2300000000L)
          .count() == 0, "replay resurrected physically erased docs")
        check(spark.table(Generations.resolve(spark, IndexName, "buckets"))
          .filter(col("doc_id") >= 2300000000L).count() == 0,
          "replay resurrected bucket rows of erased docs")
        check(probeHash(spark) == stored,
          "probe fingerprint moved after the barred replay")
        // re-ingesting erased content is a deliberate act: readmit,
        // recrawl, and the index serves the appended-state fingerprint
        Tombstones.readmit(spark, IndexName,
          ids(2300000000L, 2300000001L, 2300000002L))
        Dedup.appendToNearDupIndex(ndKillBatch(spark), IndexName,
          ifAbsent = true)
        check(probeHash(spark) == new String(java.nio.file.Files
          .readAllBytes(ndHashFile(workDir)), "UTF-8"),
          "readmitted recrawl != the pre-takedown appended state")

      // ---- ANN resurrection window (r14 verdict #4, shared body) ------
      // The same kill pair on the vec-keyed ANN family: its append
      // classifies admission by CELLS-PRESENCE (vec_id anti-join
      // against the codes table), so after an erasure compaction's
      // purge a replayed batch finds its vecs code-less and would
      // re-encode them — only the durable erased registry bars it.
      // The fingerprint here extends the probe's re-rank frame with
      // the kill batch's raw vectors (a PQ index stores codes, not
      // vectors): rows identical to the base probe while the batch is
      // NOT indexed, guaranteed-moved while it is (each query's exact
      // duplicate re-ranks to cos 1.0, never an ADC coin-flip).
      case "ann-kill-post-clear" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Tombstones.destroy(spark, AnnName)
        // the ANN matrix left the family at the clean nCells=8 state
        val stored = annStored(workDir, 8)
        check(annKillHash(spark) == stored,
          "base fingerprint drifted before the ann kill window " +
            "(extended re-rank frame must not move an unindexed probe)")
        AnnIndex.appendToAnnIndex(annKillBatch(spark), AnnName,
          ifAbsent = true)
        val ct = Generations.resolve(spark, AnnName, "cells")
        check(spark.table(ct).filter(col("vec_id") >= 3100000000L)
          .count() == 8,
          "setup append did not land — the kill window would be vacuous")
        val appended = annKillHash(spark)
        check(appended != stored, "ann kill batch does not move the probe")
        java.nio.file.Files.write(annKillHashFile(workDir),
          appended.getBytes("UTF-8"))
        AnnIndex.tombstoneAnn(spark, AnnName,
          vecIds((0L until 8L).map(_ + 3100000000L): _*))
        AnnIndex.compactAnnIndex(spark, AnnName)
        Runtime.getRuntime.halt(137)

      case "ann-recover-replay" =>
        val stored = annStored(workDir, 8)
        check(Tombstones.get(spark, AnnName).isEmpty,
          "pending set survived the completed maintenance")
        check(Tombstones.erasedSet(spark, AnnName)
          .map(_.count()).getOrElse(0L) == 8,
          "erased registry missing after the kill")
        val ct = Generations.resolve(spark, AnnName, "cells")
        check(spark.table(ct).filter(col("vec_id") >= 3100000000L)
          .count() == 0, "purge left code rows behind")
        AnnIndex.appendToAnnIndex(annKillBatch(spark), AnnName,
          ifAbsent = true)
        check(spark.table(ct).filter(col("vec_id") >= 3100000000L)
          .count() == 0, "replay resurrected physically erased vecs")
        check(annKillHash(spark) == stored,
          "probe fingerprint moved after the barred replay")
        Tombstones.readmit(spark, AnnName,
          vecIds((0L until 8L).map(_ + 3100000000L): _*))
        AnnIndex.appendToAnnIndex(annKillBatch(spark), AnnName,
          ifAbsent = true)
        check(annKillHash(spark) == new String(java.nio.file.Files
          .readAllBytes(annKillHashFile(workDir)), "UTF-8"),
          "readmitted re-encode != the pre-takedown appended state")

      // ---- GRAPH resurrection window (r14 verdict #4, shared body) ----
      // The last of the four maintained families: the k-NN graph's
      // append classifies admission by VECS-PRESENCE (the fenced
      // anti-join on the vecs member — the applied marker written
      // LAST), and an erasure compaction purges every member row
      // touching the ids, so a replayed batch finds itself absent
      // everywhere and would re-land forward AND reverse edges — only
      // the durable erased registry bars it. Every appended edge
      // touches a batch endpoint, so the purge provably restores the
      // base edge set and the fingerprint (full slice probe, rank and
      // cos bits) detects any leaked edge row.
      case "graph-build" =>
        KnnGraphIndex.writeKnnGraph(vecs(spark), GraphName,
          k = 10, nCells = 16)
        java.nio.file.Files.write(graphHashFile(workDir, "base"),
          graphProbeHash(spark).getBytes("UTF-8"))

      case "graph-kill-post-clear" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Tombstones.destroy(spark, GraphName)
        val stored = graphStored(workDir, "base")
        check(graphProbeHash(spark) == stored,
          "base fingerprint drifted before the graph kill window")
        KnnGraphIndex.appendToKnnGraph(graphKillBatch(spark), GraphName,
          ifAbsent = true)
        val vt = Generations.resolve(spark, GraphName, "vecs")
        check(spark.table(vt).filter(col("vec_id") >= 3200000000L)
          .count() == 8,
          "setup append did not land — the kill window would be vacuous")
        val appended = graphProbeHash(spark)
        check(appended != stored,
          "graph kill batch does not move the probe")
        java.nio.file.Files.write(graphHashFile(workDir, "kill"),
          appended.getBytes("UTF-8"))
        KnnGraphIndex.tombstoneGraph(spark, GraphName,
          vecIds((0L until 8L).map(_ + 3200000000L): _*))
        KnnGraphIndex.compactKnnGraph(spark, GraphName)
        Runtime.getRuntime.halt(137)

      case "graph-recover-replay" =>
        val stored = graphStored(workDir, "base")
        check(Tombstones.get(spark, GraphName).isEmpty,
          "pending set survived the completed maintenance")
        check(Tombstones.erasedSet(spark, GraphName)
          .map(_.count()).getOrElse(0L) == 8,
          "erased registry missing after the kill")
        val vt = Generations.resolve(spark, GraphName, "vecs")
        val et = Generations.resolve(spark, GraphName, "edges")
        check(spark.table(vt).filter(col("vec_id") >= 3200000000L)
          .count() == 0, "purge left vec rows behind")
        check(spark.table(et).filter(col("qid") >= 3200000000L ||
          col("vec_id") >= 3200000000L).count() == 0,
          "purge left edge rows touching erased endpoints")
        KnnGraphIndex.appendToKnnGraph(graphKillBatch(spark), GraphName,
          ifAbsent = true)
        check(spark.table(vt).filter(col("vec_id") >= 3200000000L)
          .count() == 0, "replay resurrected physically erased vecs")
        check(graphProbeHash(spark) == stored,
          "probe fingerprint moved after the barred replay")
        Tombstones.readmit(spark, GraphName,
          vecIds((0L until 8L).map(_ + 3200000000L): _*))
        KnnGraphIndex.appendToKnnGraph(graphKillBatch(spark), GraphName,
          ifAbsent = true)
        check(graphProbeHash(spark) == graphStored(workDir, "kill"),
          "readmitted re-append != the pre-takedown appended state")

      // ---- UPDATE window: the one-night replace under process death --
      // nightStep's revisions path chains applyDeletions → compactAll
      // → allowReingest → re-ingest. Two kill windows, both followed
      // by an at-least-once redelivery of the SAME night from a fresh
      // JVM: (a) mid-replace — halt at the first generation flip
      // inside the chain (tombstones committed, nothing purged; the
      // OLD versions still live everywhere); (b) post-night — the
      // whole night completed (NEW versions live) and the JVM dies
      // before the stream checkpoint commits, so the replay re-runs
      // the replace against the already-updated state (the
      // both-versions-visible wreckage class). Convergence target: a
      // TWIN artifact set that ran the identical night cleanly —
      // lexical probe fingerprint (any leaked old row moves n_docs/df
      // and flips it), corpus id set, and the shard KEY set (offsets
      // of re-packed revisions legitimately differ under replay; keys
      // and token accounting must not).
      case "upd-build" =>
        updReset(spark, updArts("twin"))
        runUpdNight(spark, updArts("twin"))
        java.nio.file.Files.write(updHashFile(workDir),
          updFingerprint(spark, updArts("twin")).getBytes("UTF-8"))
        updReset(spark, updArts("real"))

      case "upd-kill-mid-replace" =>
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        Generations.failpointHalt = true
        Generations.failpoint = Some("after-flip")
        runUpdNight(spark, updArts("real"))
        sys.error("unreachable: the replace chain should have halted")

      case "upd-recover-mid" =>
        // window (a): some tombstone/registry swap committed, the
        // purge did not run to completion — the redelivered night must
        // converge to the twin
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        runUpdNight(spark, updArts("real"))
        check(updFingerprint(spark, updArts("real")) ==
          new String(java.nio.file.Files.readAllBytes(
            updHashFile(workDir)), "UTF-8"),
          "mid-replace replay did not converge to the clean night")

      case "upd-kill-post-night" =>
        // reset and run the WHOLE night, then die before the stream
        // checkpoint would commit — the new versions are live
        updReset(spark, updArts("real"))
        runUpdNight(spark, updArts("real"))
        Runtime.getRuntime.halt(137)

      case "upd-recover-post" =>
        // window (b): the replay re-runs the replace against the
        // already-updated state (re-tombstones the NEW versions,
        // purges them, re-ingests the same revision rows) and must
        // land exactly the clean night again
        Generations.leaseTtlOverrideMs = Some(ShortTtlMs)
        runUpdNight(spark, updArts("real"))
        check(updFingerprint(spark, updArts("real")) ==
          new String(java.nio.file.Files.readAllBytes(
            updHashFile(workDir)), "UTF-8"),
          "post-night replay did not converge to the clean night")

      case other => sys.error(s"unknown lab command: $other")
    }
  }

  // ---- UPDATE lab pieces ---------------------------------------------

  private def updHashFile(workDir: String) =
    java.nio.file.Paths.get(workDir, "upd_hash_clean.txt")

  private def updArts(tag: String) =
    graft.streaming.StreamingNightlyIngest.Artifacts(s"lab_upd_${tag}_nd",
      s"lab_upd_${tag}_ann", s"lab_upd_${tag}_corpus",
      s"lab_upd_${tag}_budget",
      new java.io.File(sys.props("java.io.tmpdir"),
        s"lab_upd_${tag}_shards").getAbsolutePath)

  private def updReset(spark: SparkSession,
      arts: graft.streaming.StreamingNightlyIngest.Artifacts): Unit = {
    import graft.streaming.StreamingNightlyIngest
    Seq(arts.ndIndex, arts.annIndex, StreamingNightlyIngest.lexName(arts))
      .foreach(Tombstones.destroy(spark, _))
    Generations.destroy(spark, arts.ndIndex, Dedup.maintenanceMembers)
    Generations.destroy(spark, arts.annIndex, AnnIndex.maintenanceMembers)
    Generations.destroy(spark, StreamingNightlyIngest.lexName(arts),
      LexIndex.maintenanceMembers)
    Generations.destroy(spark, arts.annCorpusTable, Seq("vecs"))
    Generations.destroy(spark,
      StreamingNightlyIngest.deletedTable(arts), Seq("ids"))
    Generations.destroy(spark, arts.budgetTable, Seq("state"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(arts.shardPath))
    val corpus = docs(spark)
    Dedup.writeNearDupIndex(corpus, arts.ndIndex, numBuckets = 4)
    val vecs = corpus.select(col("doc_id"))
      .withColumn("embedding",
        graft.streaming.StreamingNightlyIngest.synthEmbedding)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    AnnIndex.writeAnnIndex(vecs, arts.annIndex,
      nCells = 4, m = 8, ksub = 16)
    StreamingNightlyIngest.writeCorpus(spark, arts, vecs)
    LexIndex.writeLexIndex(corpus, StreamingNightlyIngest.lexName(arts),
      numBuckets = 4)
  }

  /** The update night: docs 20–24 re-crawled with replacement text
    * (novel vocabulary) + three genuine adds. Idempotent inputs — the
    * redelivery runs the exact same call. */
  private def runUpdNight(spark: SparkSession,
      arts: graft.streaming.StreamingNightlyIngest.Artifacts): Unit = {
    import graft.streaming.StreamingNightlyIngest
    val rev = docs(spark).filter(col("doc_id") >= 20 && col("doc_id") < 25)
      .select(col("doc_id"),
        concat(lit("lab revision of document "), col("doc_id").cast("string"),
          lit(" with replacement vocabulary quorum zenith warden" +
            " ember kestrel")).as("text"))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("embedding",
        graft.streaming.StreamingNightlyIngest.synthEmbedding)
    val adds = spark.range(3)
      .select((col("id") + 2500000000L).as("doc_id"),
        concat(lit("lab update-night added document "),
          col("id").cast("string"),
          lit(" with fresh vocabulary onyx quill raven sable")).as("text"))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("embedding",
        graft.streaming.StreamingNightlyIngest.synthEmbedding)
    StreamingNightlyIngest.nightStep(arts, adds, budget = 1000000L,
      salt = "labupd", tokensPerShard = 256L, batchId = 0,
      revisions = Some(rev))
    ()
  }

  /** Convergence fingerprint: the lexical probe's full result (one
    * query carrying the replacement vocabulary — hits exactly the
    * revised docs when the replace landed; corpus-level stats fold
    * every leaked/lost row into every score), the corpus id set, the
    * registry size, and the shard KEY set (doc_id, n_tokens). */
  private def updFingerprint(spark: SparkSession,
      arts: graft.streaming.StreamingNightlyIngest.Artifacts): String = {
    import graft.streaming.StreamingNightlyIngest
    val q = spark.range(1)
      .select(lit(9500000000L).as("doc_id"),
        lit("quorum zenith warden ember kestrel onyx quill").as("text"))
      .unionByName(docs(spark).filter(col("doc_id").isin(50L, 51L))
        .select((col("doc_id") + 9600000000L).as("doc_id"), col("text")))
    val lex = LexIndex.probeLexIndex(spark,
        StreamingNightlyIngest.lexName(arts), q, kEach = 10)
      .collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getInt(2)}:" +
        r.getLong(3)).sorted.mkString(",")
    val corpusIds = StreamingNightlyIngest.corpus(spark, arts)
      .select("vec_id").collect().map(_.getLong(0)).sorted.mkString(",")
    val reg = StreamingNightlyIngest.deletedIds(spark, arts).count()
    val shardKeys = spark.read.parquet(arts.shardPath)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").sorted.mkString(",")
    val all = s"$lex|$corpusIds|$reg|$shardKeys"
    java.security.MessageDigest.getInstance("MD5")
      .digest(all.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The near-dup kill batch: exact-text copies of the three NOVEL
    * probe docs under fresh ids — indexed, they turn every novel probe
    * doc into a duplicate, so the fingerprint moves iff they are
    * (re)admitted; guaranteed-caught (Jaccard 1.0), never a threshold
    * coin-flip. */
  private def ndKillBatch(spark: SparkSession) =
    spark.range(3)
      .select((col("id") + 2300000000L).as("doc_id"),
        concat(lit("durable lab novel probe document "),
          col("id").cast("string"),
          lit(" alpha beta gamma delta epsilon zeta eta theta iota"))
          .as("text"))

  private def ndHashFile(workDir: String) =
    java.nio.file.Paths.get(workDir, "nd_hash_appended.txt")

  /** The ANN kill batch: exact copies of the eight query vectors under
    * fresh ids — indexed, each query's duplicate re-ranks to cos 1.0
    * (same cell as its query by construction, so the cell probe and
    * the ADC shortlist both admit it), guaranteed top-k. */
  private def annKillBatch(spark: SparkSession) =
    vecs(spark).filter(col("vec_id") < 8)
      .select((col("vec_id") + 3100000000L).as("vec_id"), col("embedding"))

  /** [[annProbeHash]] with the re-rank frame extended by the kill
    * batch's raw vectors: bit-identical to the base probe while the
    * batch is not indexed (candidates come from the index, queries
    * stay vec_id < 8), moved while it is. */
  private def annKillHash(spark: SparkSession): String = {
    val emb = vecs(spark).unionByName(annKillBatch(spark))
    val rows = AnnIndex.probeAnnIndex(spark, AnnName, emb,
        col("vec_id") < 8, k = 10)
      .collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getInt(2)}:" +
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
      .sorted.mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def vecIds(xs: Long*) = {
    val spark = SparkSession.active
    import spark.implicits._
    xs.toDF("vec_id")
  }

  private def annKillHashFile(workDir: String) =
    java.nio.file.Paths.get(workDir, "ann_hash_kill.txt")

  // ---- GRAPH lab pieces ------------------------------------------------
  val GraphName = "lab_graph"

  /** Graph kill batch: exact copies of the eight query vectors under
    * fresh ids — their reverse edges land in the slice probe's qids
    * at cos 1.0 (same cell as the query, which probes it), guaranteed
    * top-k while (re)admitted. */
  private def graphKillBatch(spark: SparkSession) =
    vecs(spark).filter(col("vec_id") < 8)
      .select((col("vec_id") + 3200000000L).as("vec_id"), col("embedding"))

  /** Deterministic graph fingerprint: the full slice probe (qid < 8),
    * rank and exact cos bits — a leaked edge row, lost vec, or stale
    * model all move it. */
  private def graphProbeHash(spark: SparkSession): String = {
    val rows = KnnGraphIndex.probeKnnGraph(spark, GraphName,
        col("qid") < 8)
      .collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getInt(2)}:" +
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
      .sorted.mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def graphHashFile(workDir: String, tag: String) =
    java.nio.file.Paths.get(workDir, s"graph_hash_$tag.txt")

  private def graphStored(workDir: String, tag: String): String =
    new String(java.nio.file.Files.readAllBytes(
      graphHashFile(workDir, tag)), "UTF-8")

  // ---- LEX lab pieces ------------------------------------------------
  val LexName = "lab_lex"
  private val LexBatchId = "lab-append"

  /** Five novel docs with a distinctive rare-term vocabulary: present
    * in the index they DOMINATE the vocab query's lexical list, so a
    * lost append, a double-counted stats delta, or a leaked purge all
    * move the fingerprint — never a silent tie. */
  private def lexAppendBatch(spark: SparkSession) =
    spark.range(5).select((col("id") + 2100000000L).as("doc_id"),
      concat(lit("lab lexical append document "), col("id").cast("string"),
        lit(" with vocabulary quixotic zephyr jabberwock vorpal" +
          " frumious bandersnatch")).as("text"))

  /** Deterministic probe queries: three indexed docs' full texts (hit
    * the base corpus) + one query carrying the append batch's rare
    * vocabulary (hits exactly the appended docs when present). */
  private def lexQueries(spark: SparkSession) = {
    val fromCorpus = docs(spark)
      .filter(col("doc_id").isin(50L, 51L, 52L))
      .select((col("doc_id") + 9000000000L).as("doc_id"), col("text"))
    val vocab = spark.range(1)
      .select(lit(9100000000L).as("doc_id"),
        lit("quixotic jabberwock vorpal frumious bandersnatch").as("text"))
    fromCorpus.unionByName(vocab)
  }

  /** Full-result fingerprint (qid:doc_id:rank:exact scaled-BIGINT
    * score) — any candidacy, df, or stats drift moves it. */
  private def lexProbeHash(spark: SparkSession, name: String): String = {
    val rows = LexIndex.probeLexIndex(spark, name, lexQueries(spark),
        kEach = 10)
      .collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getInt(2)}:" +
        r.getLong(3))
      .sorted.mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def lexMember(spark: SparkSession, m: String): String =
    Generations.resolve(spark, LexName, m)

  /** Rows in the family's dictionary-delta member — 0 on a fresh
    * build/compaction, > 0 once an append's delta landed. */
  private def lexVocabDeltaRows(spark: SparkSession): Long =
    spark.table(lexMember(spark, "vocab")).count()

  /** The dictionary-exactness invariant, checked in full: the
    * maintained vocabFrame (dfcap ∪ deltas) equals the dictionary
    * derived from a postings scan — same terms, same df, same
    * impact-bound stamps. */
  private def lexDictConsistent(spark: SparkSession): Boolean = {
    val fromPostings = spark.table(lexMember(spark, "postings"))
      .groupBy("tok").agg(count(lit(1)).as("df"),
        max(col("tf")).as("max_tf"), min(col("len")).as("min_len"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val maintained = LexIndex.vocabFrame(spark, LexName).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    maintained == fromPostings
  }

  private def lexHashFile(workDir: String, tag: String) =
    java.nio.file.Paths.get(workDir, s"lex_hash_$tag.txt")

  private def lexStored(workDir: String, tag: String): String =
    new String(java.nio.file.Files.readAllBytes(
      lexHashFile(workDir, tag)), "UTF-8")

  private def lexCountsFile(workDir: String) =
    java.nio.file.Paths.get(workDir, "lex_counts.txt")

  /** Shared tail of both append-window recoveries: the stats FENCE
    * must not have landed (the replay's applied-check must say no),
    * the dead appender's lease must be foreign-expired-stealable, and
    * the replayed batch must converge to the clean one-shot twin —
    * fingerprint equal, row counts equal (no duplicates), the stats
    * delta exactly once. */
  private def lexCheckFenceAbsentAndReplay(spark: SparkSession,
      workDir: String): Unit = {
    check(spark.table(lexMember(spark, "stats"))
      .filter(col("batch_id") === LexBatchId).count() == 0,
      "stats fence landed before its window")
    val st = Generations.leaseStatus(spark, LexName)
    check(st.holder.isDefined && !st.issuedByThisJvm &&
      st.expiresInMs.exists(_ <= 0) && st.acquirable,
      s"lex lease not expired-foreign-acquirable: $st")
    LexIndex.appendToLexIndex(lexAppendBatch(spark), LexName,
      batchId = LexBatchId, ifAbsent = true)
    check(lexProbeHash(spark, LexName) == lexStored(workDir, "appended"),
      "replayed append != clean one-shot build over base ∪ batch")
    val Array(twinP, twinL) = new String(java.nio.file.Files.readAllBytes(
      lexCountsFile(workDir)), "UTF-8").split(",").map(_.toLong)
    check(spark.table(lexMember(spark, "postings")).count() == twinP,
      "duplicate postings rows after replay")
    check(spark.table(lexMember(spark, "doclen")).count() == twinL,
      "duplicate doclen rows after replay")
    check(spark.table(lexMember(spark, "stats"))
      .filter(col("batch_id") === LexBatchId).count() == 1,
      "stats delta not exactly-once")
  }

  // ---- ANN lab pieces ------------------------------------------------
  val AnnName = "lab_ann"

  private def vecs(spark: SparkSession) =
    Tables(spark, Fixtures, "embeddings").select(col("vec_id"), col("embedding"))

  /** Deterministic ANN fingerprint: the full probe result (ranks AND
    * exact cos bits) of queries vec_id < 8 — any member mix, lost
    * code row, or stale centroid moves it. */
  private def annProbeHash(spark: SparkSession, name: String): String = {
    val rows = AnnIndex.probeAnnIndex(spark, name, vecs(spark),
        col("vec_id") < 8, k = 10)
      .collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getInt(2)}:" +
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
      .sorted.mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def annHashFile(workDir: String, nCells: Int) =
    java.nio.file.Paths.get(workDir, s"ann_hash$nCells.txt")

  private def annStored(workDir: String, nCells: Int): String =
    new String(java.nio.file.Files.readAllBytes(
      annHashFile(workDir, nCells)), "UTF-8")

  /** The in-process crash matrix (failpoint THROWS — the
    * GenerationsSpec/TombstoneSpec windows) re-run against the
    * persistent catalog, closing the "specs only simulate crashes in a
    * surviving JVM on an in-memory catalog" gap from both sides. */
  private def inProcessMatrix(spark: SparkSession, stored: String): Unit = {
    // crash BEFORE the flip: prior set intact, retry completes
    Generations.failpoint = Some("before-flip")
    try { Dedup.tombstoneNearDup(spark, IndexName, ids(5L)); check(cond = false, "no crash") }
    catch { case _: IllegalStateException => () }
    Generations.failpoint = None
    check(tombSet(spark).isEmpty, "crashed add half-applied on hive catalog")
    Dedup.tombstoneNearDup(spark, IndexName, ids(5L))
    check(tombSet(spark) == Set(5L), "retry after crash on hive catalog")
    // crash AFTER the flip on a compaction: new state live, probe same
    Generations.failpoint = Some("after-flip")
    try { Dedup.compactNearDupIndex(spark, IndexName); check(cond = false, "no crash") }
    catch { case _: IllegalStateException => () }
    Generations.failpoint = None
    check(probeHash(spark) == stored, "probe hash across in-process matrix")
    Dedup.compactNearDupIndex(spark, IndexName)
    check(Dedup.nearDupTombstones(spark, IndexName).isEmpty, "final clear")
    check(probeHash(spark) == stored, "final probe hash")
  }
}
