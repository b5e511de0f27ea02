package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Crash-atomic, reader-safe swaps for the maintained index families
  * ([[Dedup]] near-dup index, [[AnnIndex]]): GENERATION directories
  * plus an atomic pointer flip, replacing drop-and-rename (whose
  * drop→rename window leaves NO live table if the driver dies between
  * the two, and shows concurrent readers a missing index mid-swap).
  *
  * Layout: an index `name` with members `m ∈ {buckets, sigs}` (or
  * `{cells, model}`) is a family of physical tables `<name>_<m>_g<N>`
  * plus a zero-row manifest table `<name>_manifest` whose SINGLE table
  * property `graft.gen = N` is the pointer. Every lifecycle step:
  *
  *  1. [[begin]]: GC any orphaned generation (a crashed previous swap
  *     left either a half-written next gen — pointer never moved — or
  *     an unreclaimed old gen — pointer moved, GC didn't run; both are
  *     "any gen ≠ current" and deleting them is always safe), then
  *     hand out the next generation number.
  *  2. The caller writes the new generation's tables COMPLETELY —
  *     data, bucket/partition spec, property stamps — while readers
  *     keep resolving the current generation untouched.
  *  3. [[commit]]: ONE `ALTER TABLE … SET TBLPROPERTIES` moves the
  *     pointer (a single metastore call — the atom), then old
  *     generations are GC'd. A crash before the flip leaves the old
  *     index live and complete; after it, the new one. At no point is
  *     the index absent or partially visible, which drop-and-rename
  *     cannot promise.
  *
  * One generation number covers ALL members of a family, so a swap
  * that must replace several tables together (near-dup buckets+sigs;
  * an [[AnnIndex.retrainAnnIndex]] replacing cells AND model, which
  * must never be seen mixed — codes from one model scored against
  * another silently mis-rank) is atomic as a unit.
  *
  * The reference's closest analogue is its rolling dedup-window
  * rebuild (`/root/reference/src/nats_client.py:246-260`), which is
  * in-process state and can simply be replaced; a persisted 100 TB
  * artifact needs the pointer discipline above.
  *
  * Concurrency contract: ONE maintenance writer per family at a time
  * (foreachBatch's strict sequencing provides this for the streaming
  * loops; a batch scheduler serializes compaction/retrain the same
  * way). Readers are unrestricted — they resolve the pointer at
  * operation start and read a complete generation; the one caveat is
  * that a reader holding a generation across a LONG pause may see its
  * files GC'd after a subsequent swap, the standard snapshot-isolation
  * limit of any pointer-plus-GC scheme (widen by deferring GC if that
  * ever matters).
  */
object Generations {

  /** The pointer property on the manifest table. */
  val GenProp = "graft.gen"

  /** Test-only crash injection for the swap protocol: set to
    * `Some("before-flip")` / `Some("after-flip")` and the next
    * [[commit]] dies at that point, as a crashed driver would. Specs
    * assert the index is never absent and probes stay hash-identical
    * across both crash windows. */
  @volatile private[graft] var failpoint: Option[String] = None
  private def crashPoint(p: String): Unit =
    if (failpoint.contains(p))
      throw new IllegalStateException(s"injected crash at $p")

  def manifest(name: String): String = s"${name}_manifest"

  def physical(name: String, member: String, gen: Long): String =
    s"${name}_${member}_g$gen"

  private def parse(spark: SparkSession, t: String): TableIdentifier =
    spark.sessionState.sqlParser.parseTableIdentifier(t)

  /** Current generation of `name`, or None when no index exists. */
  def currentGen(spark: SparkSession, name: String): Option[Long] = {
    val c = spark.sessionState.catalog
    val mt = parse(spark, manifest(name))
    if (!c.tableExists(mt)) None
    else c.getTableMetadata(mt).properties.get(GenProp).map(_.toLong)
  }

  /** Resolve a logical member to its current physical table — the ONE
    * lookup every probe/append/stats path goes through. */
  def resolve(spark: SparkSession, name: String, member: String): String =
    currentGen(spark, name) match {
      case Some(g) => physical(name, member, g)
      case None => sys.error(s"no such index: $name " +
        s"(no ${manifest(name)} generation pointer — build it first)")
    }

  /** Open a swap: reclaim debris of any crashed previous swap, then
    * return the generation number to build into. The current
    * generation (if any) is untouched — readers resolve it throughout
    * the write that follows. */
  def begin(spark: SparkSession, name: String,
      members: Seq[String]): Long = {
    val cur = currentGen(spark, name)
    gcExcept(spark, name, members, cur)
    sweepStrayDirs(spark, name, members)
    cur.map(_ + 1).getOrElse(0L)
  }

  /** Close a swap: flip the pointer atomically, then GC the previous
    * generation. The flip is ONE catalog property update — before it
    * readers see the complete old generation, after it the complete
    * new one. `props` ride the SAME update, so any metadata that must
    * move atomically with the pointer (e.g. the nightly loop's
    * applied-batch fence) can never be observed out of sync with it. */
  def commit(spark: SparkSession, name: String, gen: Long,
      members: Seq[String], props: Map[String, String] = Map.empty): Unit = {
    crashPoint("before-flip")
    val mt = manifest(name)
    if (!spark.sessionState.catalog.tableExists(parse(spark, mt))) {
      // first build: the manifest's DIRECTORY may survive a previous
      // JVM while the in-memory catalog entry did not
      dropTableAndLocation(spark, mt)
      spark.sql(s"CREATE TABLE $mt (gen INT) USING parquet")
    }
    val kv = (props + (GenProp -> gen.toString))
      .map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $mt SET TBLPROPERTIES ($kv)")
    crashPoint("after-flip")
    gcExcept(spark, name, members, Some(gen))
    members.foreach(m => spark.catalog.refreshTable(physical(name, m, gen)))
  }

  /** A property from the manifest's atomic property set (None when the
    * family or the property doesn't exist). */
  def manifestProp(spark: SparkSession, name: String,
      key: String): Option[String] = {
    val c = spark.sessionState.catalog
    val mt = parse(spark, manifest(name))
    if (!c.tableExists(mt)) None
    else c.getTableMetadata(mt).properties.get(key)
  }

  /** Remove the whole family: every generation of every member plus
    * the manifest — the reset path for fixtures/tests (a production
    * deployment rebuilds THROUGH the pointer instead and never needs
    * this). */
  def destroy(spark: SparkSession, name: String,
      members: Seq[String]): Unit = {
    gcExcept(spark, name, members, None)
    sweepStrayDirs(spark, name, members)
    dropTableAndLocation(spark, manifest(name))
  }

  /** Drop every cataloged generation of the family except `keep` —
    * always safe: anything that is not the pointer's target is either
    * pre-flip debris or a post-flip leftover. Member names are matched
    * exactly (`<name>_<m>_g<digits>`), so one index being a name-prefix
    * of another (`ann` vs `ann_app`) can never cross-delete. */
  private def gcExcept(spark: SparkSession, name: String,
      members: Seq[String], keep: Option[Long]): Unit = {
    val c = spark.sessionState.catalog
    val db = c.getCurrentDatabase
    members.foreach { m =>
      val prefix = s"${name}_${m}_g"
      val rx = ("^" + java.util.regex.Pattern.quote(prefix) + "(\\d+)$").r
      c.listTables(db, s"$prefix*").foreach { ti =>
        ti.table match {
          case rx(g) if !keep.contains(g.toLong) =>
            dropTableAndLocation(spark, ti.table)
          case _ => ()
        }
      }
    }
  }

  /** Delete generation DIRECTORIES that have no catalog entry: the
    * in-memory catalog dies with the JVM but the warehouse does not,
    * so a fresh session rebuilding an index would otherwise hit
    * LOCATION_ALREADY_EXISTS on a previous run's `_g<N>` path. Only
    * uncataloged paths are touched — live generations are protected by
    * their catalog entries (and reclaimed through [[gcExcept]]). */
  private def sweepStrayDirs(spark: SparkSession, name: String,
      members: Seq[String]): Unit = {
    val c = spark.sessionState.catalog
    // all of a database's managed tables share one parent directory —
    // resolve it through the catalog (see dropTableAndLocation's note)
    val dir = new Path(
      c.defaultTablePath(parse(spark, manifest(name)))).getParent
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rxs = members.map(m =>
      ("^" + java.util.regex.Pattern.quote(s"${name}_${m}_g") + "\\d+$").r)
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (rxs.exists(_.findFirstIn(n).isDefined) &&
          !c.tableExists(parse(spark, n)))
        fs.delete(st.getPath, true)
    }
  }

  /** Drop `t` AND its on-disk location, both resolved through the
    * catalog (metadata when the table exists, defaultTablePath
    * otherwise — the layout `<warehouse>/<table>` only holds in the
    * default database, so a hand-built path would delete the wrong
    * directory). A managed table's LOCATION can outlive the in-memory
    * catalog entry across sessions, and a fresh write would then fail
    * with LOCATION_ALREADY_EXISTS. */
  def dropTableAndLocation(spark: SparkSession, t: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = parse(spark, t)
    val locUri =
      if (catalog.tableExists(ident)) catalog.getTableMetadata(ident).location
      else catalog.defaultTablePath(ident)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new Path(locUri)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
