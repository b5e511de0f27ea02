package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plan-walk assertions for the maintained indexes' layout
  * contracts — used by LayoutSpec (standalone lifecycle) and
  * StreamingNightlyIngestSpec (after the composed loop). */
object IndexLayoutChecks {

  /** The d12/d13 layout contract: both near-dup index tables are
    * scanned, and neither is re-partitioned on its way into the join
    * that consumes it — the bucketed layout IS the join partitioning,
    * so only the batch-sized side moves. At test scale Spark would
    * broadcast the tiny index; force the shuffled-join shape the
    * bucketing contract is about, and plan non-adaptively so exchanges
    * are visible pre-execution. */
  def assertNearDupProbeLayout(spark: SparkSession, name: String,
      batch: DataFrame): Unit = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.operators.Dedup
    def isIndexScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(name))
      case _ => false
    }
    val conf = spark.conf
    val (aqe0, bjt0) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    val plan = try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Dedup.incrementalNearDupSurvivorsIndexed(spark, name, batch)
        .queryExecution.executedPlan
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe0)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bjt0)
    }
    val idxScans = plan.collect { case f: FileSourceScanExec if isIndexScan(f) => f }
    assert(idxScans.size == 2, s"expected buckets+sigs scans:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
      "the batch side must shuffle to the bucket layout")
    def pathTo(p: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] =
      if (p.eq(target)) Some(List(p))
      else p.children.view.flatMap(c => pathTo(c, target)).headOption.map(p :: _)
    idxScans.foreach { scan =>
      val path = pathTo(plan, scan).getOrElse(
        sys.error(s"scan not in plan:\n$plan"))
      val belowJoin = path.drop(path.lastIndexWhere(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"index table re-shuffled before its join — bucketed layout not engaged:\n$plan")
    }
  }

  /** The s09 layout contract: the ANN probe's scan of the cells table
    * carries a dynamic partition-pruning filter — unprobed cell
    * directories are never listed. */
  def assertAnnProbePruned(probe: DataFrame): Unit = {
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
  }
}
