package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** JetStream-shaped sink (SURVEY.md §2.1 S4/S5/S6).
  *
  * Write-side semantics replicated from the reference:
  *  - output-stream DDL: create-if-missing with limits retention,
  *    max_msgs = 5M, and the 600 s `duplicate_window`
  *    (nats_client.py:81-102)
  *  - per-row publish to the row's `subject` with the
  *    `Nats-Msg-Id = uri:cid` idempotency header analog
  *    (nats_client.py:246-253) — JetStream-side dedup makes replays
  *    effectively-once (T2/S6); duplicate acks are logged and still
  *    counted as published (:255-260)
  *  - retry ≤ max_retries with linear backoff RETRY_DELAY·attempt on
  *    publish timeout, then fail the task (→ Spark task retry → batch
  *    replay, which the dedup window absorbs) (nats_client.py:242-281)
  *  - ack-stream verification: the PubAck must name the stream we
  *    published to (:254)
  *
  * Input rows must carry `subject`, `value` and optionally `msg_id`
  * string columns (extra columns are ignored).
  */
final class NatsWriteBuilder(options: Map[String, String], schema: StructType)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite = new NatsStreamingWrite(options, schema)
    override def toBatch: BatchWrite = new NatsBatchWrite(options, schema)
  }
}

private object NatsWrite {
  /** S4: ensure the output stream exists (create-if-missing DDL). */
  def ensureStream(options: Map[String, String]): String = {
    val stream = options.getOrElse("stream",
      throw new IllegalArgumentException("option 'stream' is required"))
    val subjectPrefix = options.getOrElse("subjectprefix",
      options.getOrElse("subjectPrefix", "bluesky.enriched"))
    StubJetStream.ensure(stream, Seq(s"$subjectPrefix.>"),
      maxMsgs = options.getOrElse("maxmsgs", "5000000").toLong,
      duplicateWindowMs =
        options.getOrElse("duplicatewindowms", "600000").toLong)
    stream
  }

  def factory(options: Map[String, String], schema: StructType): NatsWriterFactory = {
    val stream = ensureStream(options)
    NatsWriterFactory(stream,
      subjectIdx = schema.fieldIndex("subject"),
      valueIdx = schema.fieldIndex("value"),
      msgIdIdx = if (schema.fieldNames.contains("msg_id"))
        schema.fieldIndex("msg_id") else -1,
      maxRetries = options.getOrElse("maxretries", "3").toInt,
      retryDelayMs = options.getOrElse("retrydelayms", "50").toLong)
  }
}

final class NatsStreamingWrite(options: Map[String, String], schema: StructType)
    extends StreamingWrite with Logging {
  private val fac = NatsWrite.factory(options, schema)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = fac
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (pub, dup) = messages.collect { case NatsCommit(p, d) => (p, d) }
      .foldLeft((0L, 0L)) { case ((p, d), (p2, d2)) => (p + p2, d + d2) }
    logInfo(s"epoch $epochId: published=$pub duplicates=$dup")
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    logWarning(s"epoch $epochId aborted; JetStream msg-id dedup absorbs any partial publishes")
}

final class NatsBatchWrite(options: Map[String, String], schema: StructType)
    extends BatchWrite {
  private val fac = NatsWrite.factory(options, schema)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = fac
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class NatsCommit(published: Long, duplicates: Long)
  extends WriterCommitMessage

final case class NatsWriterFactory(stream: String, subjectIdx: Int,
    valueIdx: Int, msgIdIdx: Int, maxRetries: Int, retryDelayMs: Long)
    extends StreamingDataWriterFactory with DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new NatsDataWriter(this)
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NatsDataWriter(this)
}

final class NatsDataWriter(f: NatsWriterFactory)
    extends DataWriter[InternalRow] with Logging {
  private var published = 0L
  private var duplicates = 0L
  private def target: StubStream = StubJetStream.info(f.stream)
    .getOrElse(throw new IllegalStateException(s"stream ${f.stream} vanished"))

  override def write(row: InternalRow): Unit = {
    val subject = row.getUTF8String(f.subjectIdx).toString
    val value = row.getUTF8String(f.valueIdx).toString
    val msgId = if (f.msgIdIdx >= 0 && !row.isNullAt(f.msgIdIdx))
      row.getUTF8String(f.msgIdIdx).toString else null
    var attempt = 0
    var done = false
    while (!done) {
      try {
        val ack = target.publish(subject, value, msgId)
        // ack-stream verification (nats_client.py:254)
        if (ack.stream != f.stream)
          throw new IllegalStateException(
            s"publish acked by stream ${ack.stream}, expected ${f.stream}")
        if (ack.duplicate) duplicates += 1 // logged, still counted (S6)
        published += 1
        done = true
      } catch {
        case _: StubPublishTimeout if attempt < f.maxRetries =>
          attempt += 1
          Thread.sleep(f.retryDelayMs * attempt) // linear backoff
          logWarning(s"publish timeout, retrying (attempt $attempt)")
      }
    }
  }

  override def commit(): WriterCommitMessage = NatsCommit(published, duplicates)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
