package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.streaming.StreamingEnrich

class NatsConnectorSpec extends SparkSpec {

  private val InStream = "bluesky-posts"
  private val OutStream = "bluesky-posts-enriched"

  private def post(uri: String, cid: String, text: String): String =
    s"""{"uri":"$uri","cid":"$cid","author":"a.test","text":"$text","created_at":"2024-01-01T00:00:00Z"}"""

  /** Drop only THIS suite's streams — a global reset() would race
    * with other suites sharing the stub registry. */
  private def cleanSlate(): Unit =
    Seq(InStream, OutStream, "dw").foreach(StubJetStream.drop)

  private def input(): StubStream =
    StubJetStream.ensure(InStream, Seq("bluesky.posts.>"))

  private def readPosts(extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("stub-nats")
      .option("stream", InStream).option("subject", "bluesky.posts.>")
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("subject wildcard matching") {
    import StubJetStream.subjectMatches
    assert(subjectMatches("bluesky.posts.>", "bluesky.posts.en.tech"))
    assert(subjectMatches("bluesky.posts.>", "bluesky.posts.x"))
    assert(!subjectMatches("bluesky.posts.>", "bluesky.posts"))
    assert(!subjectMatches("bluesky.posts.>", "bluesky.enriched.x"))
    assert(subjectMatches("a.*.c", "a.b.c") && !subjectMatches("a.*.c", "a.b.d"))
  }

  test("end-to-end: stub-nats source → enrichment → stub-nats sink") {
    cleanSlate()
    val in = input()
    in.publish("bluesky.posts.a", post("at://1", "c1",
      "m m m museum join join join join stream"), "at://1:c1")
    in.publish("bluesky.posts.b", post("at://2", "c2",
      "u u u unusual window window window window"), "at://2:c2")
    in.publish("bluesky.posts.c", """{not json""", "at://bad:c") // poison

    val wire = StreamingEnrich.pipeline(readPosts())
      .select(col("subject"),
        to_json(struct(col("uri"), col("cid"), col("sentiment_data"),
          col("topics_data"), col("processor"))).as("value"),
        concat_ws(":", col("uri"), col("cid")).as("msg_id"))
    val ckpt = Files.createTempDirectory("nats_e2e").toString
    val q = wire.writeStream.format("stub-nats")
      .option("stream", OutStream)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val out = StubJetStream.info(OutStream).get.allMessages
    assert(out.length == 2) // poison dropped, 2 enriched published
    assert(out.forall(_.subject.startsWith("bluesky.enriched.")))
    assert(out.map(_.msgId).toSet == Set("at://1:c1", "at://2:c2"))
    assert(out.forall(_.data.contains("\"processor\":\"graft-spark\"")))
    // S5 output DDL: created with the reference's duplicate window
    assert(StubJetStream.info(OutStream).get.duplicateWindowMs == 600000L)
    // commit-as-ack: offsets acked after success (T1)
    assert(input().consumer("unified-processor").committed == 3L)
  }

  test("restart resumes from committed offsets; replay is dedup'd at the sink") {
    cleanSlate()
    val in = input()
    (1 to 3).foreach(i => in.publish("bluesky.posts.x",
      post(s"at://r$i", s"rc$i", "m m m join join join join"), s"at://r$i:rc$i"))

    def wire() = StreamingEnrich.pipeline(readPosts())
      .select(col("subject"), col("raw_value").as("value"),
        concat_ws(":", col("uri"), col("cid")).as("msg_id"))
    val ckpt = Files.createTempDirectory("nats_restart").toString
    def runOnce(): Unit = {
      val q = wire().writeStream.format("stub-nats")
        .option("stream", OutStream)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(StubJetStream.info(OutStream).get.allMessages.length == 3)

    // two more arrive; a restarted query must process ONLY those
    (4 to 5).foreach(i => in.publish("bluesky.posts.x",
      post(s"at://r$i", s"rc$i", "m m m join join join join"), s"at://r$i:rc$i"))
    runOnce()
    val out = StubJetStream.info(OutStream).get
    assert(out.allMessages.length == 5)
    assert(out.allMessages.map(_.msgId).toSet ==
      (1 to 5).map(i => s"at://r$i:rc$i").toSet)
    // the source-level ack (consumer committed floor) trails the
    // checkpoint by one batch: Spark commits a batch to the source at
    // the start of the NEXT cycle — like a JetStream ack floor catching
    // up on the next delivery. The offset log (source of truth for
    // restart) already holds 5.
    assert(input().consumer("unified-processor").committed == 3L)
    in.publish("bluesky.posts.x",
      post("at://r6", "rc6", "m m m join join join join"), "at://r6:rc6")
    runOnce()
    assert(out.allMessages.length == 6)
    assert(input().consumer("unified-processor").committed == 5L)

    // a FRESH checkpoint replays everything (DeliverPolicy.ALL via a
    // new consumer) — but the msg-id duplicate window absorbs all 6
    // republishes: effectively-once output (T2/S6)
    val q2 = StreamingEnrich.pipeline(
        readPosts(Map("consumer" -> "replayer")))
      .select(col("subject"), col("raw_value").as("value"),
        concat_ws(":", col("uri"), col("cid")).as("msg_id"))
      .writeStream.format("stub-nats")
      .option("stream", OutStream)
      .option("checkpointLocation", Files.createTempDirectory("nats_fresh").toString)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(out.allMessages.length == 6) // no growth
  }

  test("admission control caps batch size at max_ack_pending") {
    cleanSlate()
    val in = input()
    (1 to 7).foreach(i => in.publish("bluesky.posts.x",
      post(s"at://a$i", s"ac$i", "m m m join join join join"), null))
    val q = readPosts(Map("maxAckPending" -> "2"))
      .writeStream.format("memory").queryName("admission_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("admission_out").count() == 7)
    val progresses = q.recentProgress.filter(_.numInputRows > 0)
    assert(progresses.length >= 4) // 7 rows / ≤2 per batch
    assert(progresses.forall(_.numInputRows <= 2))
    // A9: backlog gauge visible while batches were pending
    val pendings = progresses.flatMap(p =>
      Option(p.sources(0).metrics.get("numPending")).map(_.toLong))
    assert(pendings.nonEmpty && pendings.max > 0)
  }

  test("redelivery is visible via num_delivered (T3)") {
    cleanSlate()
    val in = input()
    in.publish("bluesky.posts.x", post("at://d1", "dc1", "t"), null)
    def readAll(name: String): Array[Int] = {
      val q = readPosts().writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory(s"nats_$name").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.table(name).select("num_delivered").collect().map(_.getInt(0))
    }
    assert(readAll("redeliver_1").toSeq == Seq(1))
    // same durable consumer, fresh checkpoint → a redelivery
    assert(readAll("redeliver_2").toSeq == Seq(2))
  }

  test("publish retries with linear backoff, then fails the task") {
    cleanSlate()
    val out = StubJetStream.ensure(OutStream, Seq("bluesky.enriched.>"))
    val fac = NatsWriterFactory(OutStream, subjectIdx = 0, valueIdx = 1,
      msgIdIdx = -1, maxRetries = 3, retryDelayMs = 1)
    def row(subj: String, v: String) = InternalRow(
      UTF8String.fromString(subj), UTF8String.fromString(v))

    // 2 injected timeouts < 3 retries → succeeds
    out.failNextPublishes = 2
    val w = new NatsDataWriter(fac)
    w.write(row("bluesky.enriched.pos.t", "payload-1"))
    assert(w.commit() == NatsCommit(1, 0))
    assert(out.allMessages.length == 1)

    // 4 injected timeouts > 3 retries → exhausts and throws (task
    // failure → Spark retry → batch replay, absorbed by msg-id dedup)
    out.failNextPublishes = 4
    intercept[StubPublishTimeout] {
      new NatsDataWriter(fac).write(row("bluesky.enriched.pos.t", "payload-2"))
    }
  }

  test("duplicate window expires: same msg-id republishes after expiry") {
    cleanSlate()
    val s = StubJetStream.ensure("dw", Seq(">"), duplicateWindowMs = 1000L)
    var now = 0L
    s.clock = () => now
    assert(!s.publish("a.b", "x", "id1").duplicate)
    now = 500L
    val dup = s.publish("a.b", "x", "id1")
    assert(dup.duplicate && dup.seq == 1L && s.allMessages.length == 1)
    now = 1500L // past the window → stored again
    assert(!s.publish("a.b", "x", "id1").duplicate)
    assert(s.allMessages.length == 2)
  }
}
