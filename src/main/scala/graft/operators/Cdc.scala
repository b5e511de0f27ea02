package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture APPLY — MERGE INTO semantics as a plain plan:
  * fold a batch of keyed changes (insert / update / delete, each with
  * a sequence number) into a snapshot, latest change per key winning.
  * The maintenance story for plain-parquet snapshots the way d13/d14
  * are for the near-dup index and p05 is for the shard layout: the
  * nightly "apply the day's changes" step of every warehouse/training
  * corpus that tracks a mutable upstream.
  *
  * Semantics (the Delta/Iceberg MERGE contract, engine-neutral):
  *  - per key, only the change with the highest `seqCol` matters;
  *  - latest op D → the key disappears (even if it was inserted by an
  *    earlier change in the same batch);
  *  - latest op I/U → the change row's payload replaces the snapshot
  *    row (or creates it — upsert does not distinguish I from U);
  *  - snapshot keys without changes pass through verbatim.
  *
  * PRECONDITION: `seqCol` is unique per key within the batch (the CDC
  * log's own ordering guarantee); ties would make "latest" ambiguous.
  *
  * Scale shape: one partial-aggregated shuffle on key collapses the
  * change log (`max_by(struct(payload), seq)` — no window, no sort),
  * then one anti-join keyed the same way gates the snapshot, then a
  * union. A CDC batch is normally ≪ the snapshot, so the collapsed
  * change set rides a broadcast into the anti-join and the snapshot
  * NEVER shuffles — at 100 TB the cost is one scan of the snapshot
  * plus the (tiny) log aggregation. With a bucketed snapshot the
  * shuffle-join fallback is exchange-free on the snapshot side too
  * (the d12 layout argument). */
object Cdc {

  /** Apply `changes` to `snapshot`. Both must share the key columns;
    * `changes` additionally carries `opCol` (values 'I'/'U'/'D'),
    * `seqCol`, and — for I/U — the full snapshot payload. Delete
    * changes may carry null payload columns. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val payload = snapshot.columns.toSeq // output schema = snapshot's
    val latest = changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((Seq(opCol) ++ payload.filterNot(keyCols.contains))
          .map(col): _*),
        col(seqCol)).as("_ch"))
      .select(keyCols.map(col) :+ col("_ch.*"): _*)
    val untouched = snapshot.join(
      broadcast(latest.select(keyCols.map(col): _*)), keyCols, "left_anti")
    untouched.unionByName(
      latest.filter(col(opCol) =!= "D").select(payload.map(col): _*))
  }
}
