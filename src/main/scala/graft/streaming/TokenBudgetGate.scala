package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** One input document for the gate: its mixture stratum (domain /
  * language / source), unique id, and token count. Top-level case
  * class — MemoryStream/Encoders require it. */
final case class BudgetDoc(stratum: String, doc_id: Long, n_tokens: Long)

/** An admitted document with its stratum's running token total. */
final case class AdmittedDoc(stratum: String, doc_id: Long, n_tokens: Long,
    cum_tokens: Long)

/** The STREAMING twin of q30's token-budget mixture
  * ([[graft.operators.Sampling.tokenBudgetSample]]): admit documents
  * per stratum until the stratum's cumulative token count reaches the
  * budget, across micro-batches — the admission-control shape of the
  * reference's continuous pipeline (caps enforced on a live stream,
  * not a closed corpus).
  *
  * ORDER is where stream and batch genuinely differ, so the contract
  * is explicit: q30's global md5 order needs the corpus closed (any
  * later arrival could outrank an already-decided doc — same argument
  * as the packing boundary in [[StreamingCorpusPrep]]); the streaming
  * gate therefore decides in EPOCH order — micro-batches are
  * processed in arrival order, and WITHIN each micro-batch rows fold
  * in the same md5(key:salt) rank the batch operator uses (Spark's
  * intra-batch iterator order is partitioning-dependent; sorting by
  * the pure rank makes every replay of the same batches admit the
  * same set). A stream that delivers everything in one micro-batch
  * is therefore EXACTLY q30 (the parity spec pins this, which also
  * pins the JVM-vs-SQL md5 rank agreement); a multi-batch stream is
  * q30 applied epoch-by-epoch with the budget remainder carried.
  *
  * The cumulative count follows q30's prefix rule: EVERY document of
  * the stratum counts into the running total, admitted or not, so a
  * stratum that reaches its budget stays closed (no first-fit
  * backfilling of small late docs — the batch twin has no such rule
  * either, and parity would break if the stream invented one).
  *
  * State: ONE long per stratum (tokens seen), RocksDB-backed, no
  * timers — bounded by the stratum vocabulary, not stream length.
  */
object TokenBudgetGate {

  /** The q30 ordering rank, computed JVM-side: numeric value of the
    * first 13 hex chars (52 bits, double-exact) of md5(id:salt) —
    * bit-identical to the SQL `conv(substring(md5(...), 1, 13), 16,
    * 10)` spelling, which the single-batch parity test proves. */
  private[streaming] def md5Rank(id: Long, salt: String): Long = {
    val digest = MessageDigest.getInstance("MD5")
      .digest(s"$id:$salt".getBytes("UTF-8"))
    // 13 hex chars = 6.5 bytes: 6 full bytes + the high nibble of the 7th
    var acc = 0L
    var i = 0
    while (i < 6) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    (acc << 4) | ((digest(6) & 0xf0L) >> 4)
  }

  class Processor(budget: Long, salt: String)
      extends StatefulProcessor[String, BudgetDoc, AdmittedDoc] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen_tokens", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BudgetDoc],
        timerValues: TimerValues): Iterator[AdmittedDoc] = {
      var run = if (seen.exists()) seen.get() else 0L
      val out = Array.newBuilder[AdmittedDoc]
      rows.toArray.sortBy(d => (md5Rank(d.doc_id, salt), d.doc_id)).foreach { d =>
        run += d.n_tokens
        if (run <= budget) out += AdmittedDoc(key, d.doc_id, d.n_tokens, run)
      }
      seen.update(run)
      out.result().iterator
    }
  }

  /** Gate a streaming [[BudgetDoc]] frame. No watermark needed — the
    * gate is order-of-arrival by design and keeps no timers. Requires
    * the RocksDB state store provider (transformWithState's backing
    * store). */
  def gate(spark: SparkSession, docs: Dataset[BudgetDoc], budget: Long,
      salt: String): Dataset[AdmittedDoc] = {
    import spark.implicits._
    docs.groupByKey(_.stratum)
      .transformWithState(new Processor(budget, salt),
        TimeMode.None(), OutputMode.Append())
  }
}
