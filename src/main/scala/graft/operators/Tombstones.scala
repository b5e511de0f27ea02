package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared crash-atomic PENDING-DELETION store behind the three
  * maintained indexes ([[Dedup]] near-dup, [[AnnIndex]],
  * [[KnnGraphIndex]]): a one-member [[Generations]] family
  * `<index>_tombstones` whose `ids` table holds the ids deleted
  * logically but not yet physically reclaimed.
  *
  * Why a family and not a plain table: tombstone mutation used to be
  * merge-then-`mode("overwrite")`, and an overwrite-saveAsTable is
  * DROP-AND-RECREATE — a crash mid-write loses the whole pending
  * erasure set, and probes would resurrect taken-down ids until
  * re-tombstoned. That is exactly the drop-create window the takedown
  * registry and the raw-vector corpus were moved behind the generation
  * pointer for ([[graft.streaming.StreamingNightlyIngest]]); the
  * tombstone sets were the last mutable artifact still outside it.
  * Here every mutation writes a NEW generation and flips the pointer
  * in one catalog call: a crash before the flip leaves the prior set
  * intact and visible, after it the merged set — at no point is the
  * pending-deletion state absent (TombstoneSpec injects a crash in
  * both windows and asserts exactly that).
  *
  * Emptiness rides the manifest's atomic property set
  * ([[EmptyProp]], flipped in the SAME catalog call as the pointer),
  * so [[get]] answers "no pending deletions" from catalog metadata
  * alone — no per-probe data job.
  *
  * The reference has no persisted deletion state (its dedup window is
  * in-process, `/root/reference/src/nats_client.py:246-260`); a
  * persisted 100 TB artifact's erasure set must survive a crashed
  * writer, hence the pointer discipline.
  */
private[graft] object Tombstones {

  private val Members = Seq("ids")

  /** Test-only injection point inside [[clearApplied]], fired AFTER the
    * erased-registry write but BEFORE the clearing swap acquires the
    * tombstone family's lease — the residual race window (r13 advice):
    * the caller's index lease is already released, so a concurrent
    * takedown can commit here. Specs inject one and assert it
    * survives. */
  @volatile private[graft] var clearRaceHook: Option[() => Unit] = None

  /** "The current generation holds zero ids" — stamped atomically with
    * the pointer so emptiness never needs a data read. */
  val EmptyProp = "graft.tombstones.empty"

  /** Pending-set SIZE, stamped atomically with the pointer — the
    * erasure-debt gauge ([[pendingCount]]): between compactions of a
    * long-lived deployment the set only grows, and an operator
    * watching [[Generations.leaseStatus]] should see how much
    * reclamation the next compaction owes without paying a data job. */
  val PendingProp = "graft.tombstones.pending"

  /** Mutations writing a merged set LARGER than this spread it across
    * `spark.sql.shuffle.partitions` tasks instead of one file: the
    * accumulated pending set is unbounded between compactions, and a
    * `coalesce(1)` of it would serialize every mutation through a
    * single task at exactly the deployment sizes where takedown
    * batches are largest (the `Sharding` >10k-fallback discipline
    * applied to the erasure store). Below it, one file keeps the
    * common case — takedown-sized sets — listing-cheap to anti-join. */
  private[graft] val SingleFileMax = 100000L

  def family(index: String): String = s"${index}_tombstones"

  /** A pre-r11 deployment's PLAIN `<index>_tombstones` table (the old
    * overwrite-based store), if one exists and the family does not —
    * its pending erasures must stay visible across the upgrade, the
    * same contract [[graft.streaming.StreamingNightlyIngest]]'s
    * corpusPhysical keeps for the legacy corpus table. */
  private def legacyTable(spark: SparkSession,
      index: String): Option[String] = {
    val fam = family(index)
    if (spark.sessionState.catalog.tableExists(
        spark.sessionState.sqlParser.parseTableIdentifier(fam)))
      Some(fam)
    else None
  }

  /** The pending-deletion set of `index`, or None when empty/absent.
    * Catalog-metadata-only when empty — probes pay no extra job. A
    * legacy plain table (pre-family deployments) reads as the current
    * set; the next MUTATION migrates it into the family (reads stay
    * pure — a read-path write would race the index's writer lease). */
  def get(spark: SparkSession, index: String): Option[DataFrame] = {
    val fam = family(index)
    Generations.currentGen(spark, fam) match {
      case Some(_)
        if Generations.manifestProp(spark, fam, EmptyProp).contains("true") =>
        None
      case Some(_) => Some(spark.table(Generations.resolve(spark, fam, "ids")))
      case None => legacyTable(spark, index).map(spark.table)
    }
  }

  /** A migration crash window's debris: if a previous add/clear died
    * AFTER its family swap committed but BEFORE it dropped the plain
    * legacy table, that table is orphaned — the family is the truth
    * and [[get]] ignores the plain table, but a later [[destroy]]
    * would resurrect the stale pre-migration set through the legacy
    * fallback. Every MUTATION retires such debris up front (mirroring
    * [[graft.streaming.StreamingNightlyIngest]]'s corpusPhysical);
    * reads stay pure. */
  private def dropOrphanLegacy(spark: SparkSession, index: String): Unit =
    if (Generations.currentGen(spark, family(index)).isDefined)
      legacyTable(spark, index)
        .foreach(Generations.dropTableAndLocation(spark, _))

  /** The merged set's write: one file at takedown sizes, a partitioned
    * multi-task write past [[SingleFileMax]] (see its note). */
  private def writeIds(merged: DataFrame, n: Long, table: String): Unit = {
    val spark = merged.sparkSession
    val shaped =
      if (n > SingleFileMax)
        merged.repartition(spark.sessionState.conf.numShufflePartitions,
          col(merged.columns.head))
      else merged.coalesce(1)
    shaped.write.format("parquet").saveAsTable(table)
  }

  /** Merge `ids` (first column, cast to long, named `idCol`) into the
    * set — one generation swap, idempotent (distinct-merged). Callers
    * hold their index family's writer lease around this (serializing
    * against compaction); the tombstone family's own lease guards the
    * swap itself. */
  def add(spark: SparkSession, index: String, ids: DataFrame,
      idCol: String): Unit = {
    val fam = family(index)
    dropOrphanLegacy(spark, index)
    Generations.swap(spark, fam, Members) { lease =>
      // merged under the family's writer lease (the clearApplied
      // discipline, applied symmetrically): a clearApplied committing
      // between a pre-lease pin and this swap would otherwise see its
      // subtraction re-added — benign (the re-added ids' rows are
      // already purged) but a state no one should have to reason
      // about. Under the lease the two mutations serialize cleanly.
      val add = ids.select(col(ids.columns.head).cast("long").as(idCol))
        .distinct()
      // `get` folds a legacy plain table in as the current set, so the
      // first post-upgrade mutation MIGRATES it: merged into the new
      // generation (pin breaks the read-what-we-then-drop dependency;
      // the plain table is retired after the flip)
      val merged = Frontier.pin(get(spark, index)
        .fold(add)(cur => cur.unionByName(
          add.select(col(add.columns.head).as(cur.columns.head)))
          .distinct()))
      val n = merged.count() // pinned: the count re-reads the checkpoint
      writeIds(merged, n, Generations.physical(fam, "ids", lease.gen))
      Map(EmptyProp -> (n == 0L).toString, PendingProp -> n.toString)
    }
    // the swap committed, so the family is the truth: retire a
    // just-migrated plain legacy table
    dropOrphanLegacy(spark, index)
  }

  /** Remove exactly the ids a compaction/rebuild APPLIED, leaving any
    * tombstone that landed after the caller captured its snapshot
    * pending for the next maintenance pass. [[clear]]'s whole-set
    * reset is only safe while no other writer can mutate the set; the
    * index writers release their lease at the generation flip, so a
    * takedown arriving in the flip→clear window would be wiped
    * UNAPPLIED by a blanket clear — a silently lost right-to-erasure.
    * `applied` must be a PINNED frame (the capture survives the
    * tombstone family's own generation GC, and is re-read by both
    * writes below). Itself a swap; a crash before its flip leaves
    * applied-but-uncleared ids, harmless as ever (probes anti-join ids
    * whose rows are already gone).
    *
    * Two r13-advice disciplines:
    *
    *  - `remaining` is computed INSIDE the swap callback, under the
    *    tombstone family's writer lease. The caller's index lease is
    *    already free here, so a concurrent takedown can commit a new
    *    id between entry and our swap; a pre-lease anti-join would pin
    *    a set that predates it and the flip would silently wipe that
    *    takedown unapplied — the narrow remnant of the exact race this
    *    method exists to close. Under the lease, any takedown either
    *    committed before our `begin` (visible to the re-read, so it
    *    survives the subtraction) or blocks until our flip (survives
    *    trivially).
    *  - the applied set is first recorded in the durable ERASED
    *    registry ([[registerErased]]), so "this id was physically
    *    purged" outlives the pending set it is being removed from. A
    *    crash between the two writes leaves ids both registered AND
    *    pending — harmless (each side anti-joins independently); the
    *    reverse order would open a window where an erasure is neither
    *    pending nor registered and an `ifAbsent` replay could re-admit
    *    it. */
  def clearApplied(spark: SparkSession, index: String,
      applied: DataFrame): Unit = {
    registerErased(spark, index, applied)
    clearStale(spark, index, applied)
  }

  /** [[clearApplied]] WITHOUT the erased-registry write — the REBUILD
    * path's clear: a rebuild defines the index's contents from scratch
    * over the corpus it was handed, so the pre-rebuild pending set is
    * STALE (it targets a replaced generation), not APPLIED — the docs
    * may be fully present in the fresh generation, and registering
    * them as erased would wrongly bar their future `ifAbsent` appends.
    * Only a compaction — which physically purges the pending rows —
    * may claim the erasure happened ([[clearApplied]]). Same
    * under-lease subtraction discipline. */
  def clearStale(spark: SparkSession, index: String,
      applied: DataFrame): Unit = {
    dropOrphanLegacy(spark, index)
    clearRaceHook.foreach(_.apply())
    if (get(spark, index).isDefined) {
      val fam = family(index)
      Generations.swap(spark, fam, Members) { lease =>
        val remaining = get(spark, index) match {
          case Some(cur) =>
            val idCol = cur.columns.head
            Frontier.pin(cur.join(
              applied.select(
                col(applied.columns.head).cast("long").as(idCol)),
              Seq(idCol), "left_anti"))
          // column named from the caller's frame, not a hardcoded 'id':
          // the family otherwise carries the index's id column
          // (doc_id/vec_id), and a future direct reader of the empty
          // set must see the same schema
          case None =>
            spark.range(0).select(lit(0L).as(applied.columns.head))
        }
        val n = remaining.count()
        writeIds(remaining, n, Generations.physical(fam, "ids", lease.gen))
        Map(EmptyProp -> (n == 0L).toString, PendingProp -> n.toString)
      }
      // the swap committed, so the family is now the truth: retire a
      // just-migrated plain legacy table (same post-flip step as add's)
      dropOrphanLegacy(spark, index)
    }
  }

  /** Reset to empty (after a compaction/rebuild applied the set) —
    * itself a swap: a crash before the flip leaves the applied set in
    * place, which is harmless (probes anti-join ids whose rows are
    * already gone) and cleared by the next mutation. Callers that can
    * race a concurrent takedown must use [[clearApplied]] instead.
    * The whole set being cleared was applied (that is the contract),
    * so it is recorded in the ERASED registry first — same ordering
    * argument as [[clearApplied]]. */
  def clear(spark: SparkSession, index: String): Unit = {
    dropOrphanLegacy(spark, index)
    get(spark, index).foreach(cur =>
      registerErased(spark, index, Frontier.pin(cur)))
    get(spark, index).map(_.columns.head).foreach { idName =>
      val fam = family(index)
      val legacy = legacyTable(spark, index)
        .filter(_ => Generations.currentGen(spark, fam).isEmpty)
      Generations.swap(spark, fam, Members) { lease =>
        // empty set keeps the family's id column name (doc_id/vec_id)
        spark.range(0).select(lit(0L).as(idName)).coalesce(1)
          .write.format("parquet")
          .saveAsTable(Generations.physical(fam, "ids", lease.gen))
        Map(EmptyProp -> "true", PendingProp -> "0")
      }
      legacy.foreach(Generations.dropTableAndLocation(spark, _))
    }
  }

  /** The erasure-debt gauge: how many ids await physical reclamation.
    * Catalog-metadata-only once a [[PendingProp]] stamp exists (every
    * mutation since the stamp writes one); pre-stamp families and
    * legacy plain tables pay one count. Surfaced so an operator
    * watching a family ([[Generations.leaseStatus]]) also sees how
    * much the next compaction owes. */
  def pendingCount(spark: SparkSession, index: String): Long = {
    val fam = family(index)
    Generations.currentGen(spark, fam) match {
      case Some(_)
        if Generations.manifestProp(spark, fam, EmptyProp).contains("true") =>
        0L
      case Some(_) =>
        Generations.manifestProp(spark, fam, PendingProp).map(_.toLong)
          .getOrElse(
            spark.table(Generations.resolve(spark, fam, "ids")).count())
      case None =>
        legacyTable(spark, index).map(spark.table(_).count()).getOrElse(0L)
    }
  }

  /** ERASURE OVERRIDES HISTORY — the guard every tombstone-applying
    * compaction calls before a swap that would RETAIN generations
    * (`gcKeep ≥ 2`, the as-of read window): the compaction is the
    * moment tombstoned deletions become physical, and a retained
    * pre-erasure generation would keep the deleted rows on disk (and
    * [[Generations.resolveAsOf]]-readable) for another swap cycle —
    * the exact outcome a takedown exists to prevent. Refusing loudly
    * makes the safe composition the only composition: run the erasure
    * compaction with `gcKeep = 1` (purging retained history), then
    * resume retention on later swaps. Free on the default path (the
    * check runs only when `gcKeep > 1`), metadata-only when the
    * pending stamp exists. */
  def requireErasurePurges(spark: SparkSession, index: String,
      gcKeep: Int): Unit =
    if (gcKeep > 1) {
      val pending = pendingCount(spark, index)
      require(pending == 0L,
        s"erasure compaction on '$index' cannot retain history: " +
          s"gcKeep=$gcKeep with $pending pending tombstone(s) would " +
          "keep deleted rows on disk (and as-of-readable) for another " +
          "swap cycle — run the erasure with gcKeep=1, then resume " +
          "retention on later swaps")
    }

  /** Remove the family entirely — fixture/test reset, the
    * [[Generations.destroy]] twin. Any plain legacy table goes too:
    * leaving it would resurrect the stale pre-migration erasure set
    * through [[get]]'s legacy fallback. The erased registry goes with
    * it (destroy is the full-reset path; a production deployment never
    * destroys — it [[readmit]]s). */
  def destroy(spark: SparkSession, index: String): Unit = {
    Generations.destroy(spark, family(index), Members)
    Generations.destroy(spark, erasedFamily(index), Members)
    legacyTable(spark, index)
      .foreach(Generations.dropTableAndLocation(spark, _))
  }

  // ------------------------------------------------------------------
  // The durable ERASED registry
  // ------------------------------------------------------------------
  //
  // "This id's rows were physically purged from the index" must
  // OUTLIVE the pending tombstone that caused the purge: a compaction
  // consolidates the per-batch bookkeeping an `ifAbsent` replay fence
  // keys on (the lex stats fence row vanishes, doclen loses the purged
  // docs), so a micro-batch replayed after the compaction — the JVM
  // died between the maintenance callback and the stream checkpoint
  // commit — finds neither the fence nor the docs and would classify
  // the erased docs as admitted, re-inserting rows whose takedown was
  // already made physical (r13 advice). The pending set cannot carry
  // this ("pending" ends at clearApplied, which is exactly when the
  // window opens); a registry of applied erasures can. Ids only —
  // the same footprint argument as the nightly pipeline's takedown
  // registry (StreamingNightlyIngest), which plays this role at
  // pipeline level; this one covers indexes maintained outside it.
  //
  // Policy: an erased id stays barred from `ifAbsent` (replay-capable)
  // appends until an operator explicitly [[readmit]]s it — re-ingesting
  // previously erased content is a deliberate act, never a replay
  // side effect. Plain (ifAbsent = false) appends are unaffected.

  def erasedFamily(index: String): String = s"${index}_erased"

  /** The registry's contents, or None when empty/absent —
    * catalog-metadata-only when empty ([[EmptyProp]], the [[get]]
    * fast path). */
  def erasedSet(spark: SparkSession, index: String): Option[DataFrame] = {
    val fam = erasedFamily(index)
    Generations.currentGen(spark, fam) match {
      case Some(_)
        if Generations.manifestProp(spark, fam, EmptyProp).contains("true") =>
        None
      case Some(_) => Some(spark.table(Generations.resolve(spark, fam, "ids")))
      case None => None
    }
  }

  /** Merge `ids` (first column, cast to long) into the erased
    * registry — a [[Generations]] swap, idempotent (distinct-merged),
    * with the merge computed UNDER the registry's writer lease (the
    * [[clearApplied]] discipline: two concurrent registrations must
    * both survive). Rewrite cost ∝ registry size — ids only, the
    * accepted takedown-registry footprint. */
  def registerErased(spark: SparkSession, index: String,
      ids: DataFrame): Unit = {
    val fam = erasedFamily(index)
    Generations.swap(spark, fam, Members) { lease =>
      val add = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
        .distinct()
      val merged = Frontier.pin(erasedSet(spark, index).fold(add)(cur =>
        cur.unionByName(add.select(col(add.columns.head)
          .as(cur.columns.head))).distinct()))
      val n = merged.count()
      writeIds(merged, n, Generations.physical(fam, "ids", lease.gen))
      Map(EmptyProp -> (n == 0L).toString, PendingProp -> n.toString)
    }
  }

  /** Registry SIZE — [[pendingCount]]'s twin for the erased side,
    * catalog-metadata-only (every registry write stamps the count). */
  def erasedCount(spark: SparkSession, index: String): Long = {
    val fam = erasedFamily(index)
    Generations.currentGen(spark, fam) match {
      case Some(_)
        if Generations.manifestProp(spark, fam, EmptyProp).contains("true") =>
        0L
      case Some(_) =>
        Generations.manifestProp(spark, fam, PendingProp).map(_.toLong)
          .getOrElse(
            spark.table(Generations.resolve(spark, fam, "ids")).count())
      case None => 0L
    }
  }

  /** RE-ADMISSION: remove `ids` from the erased registry so a future
    * ingest of those docs lands normally — the explicit operator act
    * re-ingesting erased content requires (the nightly registry's
    * removeFromRegistry policy, at index level). Computed under the
    * registry's lease, same as [[registerErased]]. */
  def readmit(spark: SparkSession, index: String, ids: DataFrame): Unit = {
    val fam = erasedFamily(index)
    if (erasedSet(spark, index).isDefined)
      Generations.swap(spark, fam, Members) { lease =>
        val remaining = erasedSet(spark, index) match {
          case Some(cur) =>
            val idCol = cur.columns.head
            Frontier.pin(cur.join(
              ids.select(col(ids.columns.head).cast("long").as(idCol)),
              Seq(idCol), "left_anti"))
          // same schema-consistency rule as clearStale's empty write:
          // derive the column from the caller, never hardcode (vec-keyed
          // families carry vec_id here)
          case None =>
            spark.range(0).select(lit(0L).as(ids.columns.head))
        }
        val n = remaining.count()
        writeIds(remaining, n, Generations.physical(fam, "ids", lease.gen))
        Map(EmptyProp -> (n == 0L).toString, PendingProp -> n.toString)
      }
  }

  /** The replay bar every `ifAbsent` append applies to its admitted
    * set: anti-join `batch` against the PENDING set (a takedown whose
    * compaction hasn't run yet — the replay arrived before the purge)
    * and the ERASED registry (the purge and its clearApplied already
    * ran — the post-compaction resurrection window, r13 advice). Both
    * sides are id-only frames, broadcast-sized at takedown scale;
    * no-op (no join added) when both are empty/absent. */
  def barReplayed(batch: DataFrame, index: String,
      idCol: String): DataFrame = {
    val spark = batch.sparkSession
    (get(spark, index).toSeq ++ erasedSet(spark, index).toSeq)
      .foldLeft(batch)((b, ts) => b.join(
        ts.select(col(ts.columns.head).cast("long").as(idCol)),
        Seq(idCol), "left_anti"))
  }
}
