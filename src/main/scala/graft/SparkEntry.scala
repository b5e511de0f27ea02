package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one entry in
  * `queries` (run by Verify/Bench) and, when ANSI-SQL-expressible, a
  * DuckDB oracle in `oracleSql` (driver hash-compares at sf0.01).
  */
object SparkEntry {

  /** All query modules, concatenated. Names must be unique — a
    * duplicate would silently shadow its twin in the `queries` map and
    * the driver's gate would "pass" while checking the wrong plan. */
  def registry: Seq[Q] = {
    val all =
      Relational.all ++ Advanced.all ++ Enrichment.all ++ TextAnalysis.all ++
        DedupQueries.all ++ SimilarityQueries.all ++ Events.all ++
        MultimodalQueries.all ++ Accuracy.all ++ CorpusPrep.all ++
        HybridQueries.all
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
