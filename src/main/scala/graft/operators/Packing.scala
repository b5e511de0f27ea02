package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training: concatenate the corpus in a stable
  * document order and cut every `budget` tokens (the GPT-style
  * pack-then-slice layout — documents straddle sequence boundaries by
  * design). The planner emits, per document, its global token offset
  * and the first/last training sequence it lands in.
  *
  * The core is a GLOBAL prefix sum over token counts. The obvious
  * `sum(n) OVER (ORDER BY doc_id)` is a scale trap: an un-partitioned
  * window moves the entire corpus through ONE reducer. This runs the
  * classic two-phase distributed scan instead:
  *
  *   1. range-repartition by the ordering key + sort within partitions
  *      (each partition owns a contiguous key range, ~corpus/P rows);
  *   2. per-partition token subtotals — P numbers — to the driver, a
  *      P-element exclusive scan there (driver work is O(P), not
  *      O(rows));
  *   3. one narrow mapPartitions pass: each partition adds its base
  *      offset while running a local prefix sum.
  *
  * No stage sees more than corpus/P rows in one task; the only wide op
  * is the range exchange any global ordering pays. The partitioned
  * frame is pinned with [[Frontier.pin]] so phases 2 and 3 read the
  * SAME partitioning (range boundaries come from sampling; re-planning
  * between the two jobs could otherwise shift rows across partitions
  * and corrupt every base offset); `graft.pin.reliable` upgrades the
  * pin to a fault-tolerant checkpoint for cluster runs.
  */
object Packing {

  /** (id, n) → (id, n, start) where start = Σ n over all rows with
    * smaller id — the exclusive prefix sum, distributed as above. */
  def tokenOffsets(counts: DataFrame, idCol: String, nCol: String,
      numParts: Int = 0): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val p = if (numParts > 0) numParts else spark.sparkContext.defaultParallelism
    val parted = Frontier.pin(counts
      .select(col(idCol).cast("long"), col(nCol).cast("long"))
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(idCol)
      .select(col(idCol), col(nCol), spark_partition_id().as("pid"))
      .as[(Long, Long, Int)]) // pin the range boundaries across both jobs
    val subtotals = parted.groupBy(col("pid"))
      .agg(sum(col(nCol)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive scan over the P per-partition subtotals (driver: O(P))
    val bases = (0 until p).scanLeft(0L)((acc, i) =>
      acc + subtotals.getOrElse(i, 0L)).toArray
    parted.mapPartitions { it =>
      var run = -1L // initialized from the first row's pid
      it.map { case (id, n, pid) =>
        if (run < 0) run = bases(pid)
        val st = run
        run += n
        (id, n, st)
      }
    }.toDF(idCol, nCol, "start_tok")
  }

  /** Full packing plan: per doc, global offset + first/last sequence
    * index for a `budget`-token context. Empty docs (n = 0) occupy no
    * tokens; they're pinned to seq_first at offset start. */
  def packPlan(counts: DataFrame, idCol: String, nCol: String,
      budget: Int, numParts: Int = 0): DataFrame =
    tokenOffsets(counts, idCol, nCol, numParts)
      .select(col(idCol), col(nCol), col("start_tok"),
        expr(s"start_tok div $budget").as("seq_first"),
        greatest(expr(s"start_tok div $budget"),
          expr(s"(start_tok + $nCol - 1) div $budget")).as("seq_last"),
        (col("start_tok") % budget).cast("int").as("seq_offset"))
}
