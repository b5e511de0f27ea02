package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Observability side-DAG (SURVEY.md §2.4 A1-A9) as a
  * StreamingQueryListener: Structured Streaming already computes the
  * reference's hand-rolled 20-second rate window (A7) —
  * `inputRowsPerSecond` / `processedRowsPerSecond` per progress event —
  * and source lag (A9) comes from the offsets in each progress.
  * Poison-pill and volume counters (A1/A4) arrive via the `observe`
  * metrics the parse stage attaches.
  */
final class MetricsListener extends StreamingQueryListener {

  val counters = new ConcurrentHashMap[String, LongAdder]()
  @volatile var lastInputRowsPerSecond: Double = 0.0
  @volatile var lastProcessedRowsPerSecond: Double = 0.0
  @volatile var batches: Long = 0L

  private def inc(name: String, by: Long): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).add(by)

  def count(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    inc("queries_started", 1)

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    batches += 1
    inc("rows_input_total", p.numInputRows)
    lastInputRowsPerSecond = p.inputRowsPerSecond
    lastProcessedRowsPerSecond = p.processedRowsPerSecond
    val om = p.observedMetrics
    if (om.containsKey("graft_parse")) {
      val row = om.get("graft_parse")
      inc("posts_processed_total", row.getAs[Long]("rows_total"))
      inc("errors_json_parse_total", row.getAs[Long]("poison_total"))
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    inc("queries_terminated", 1)
}
