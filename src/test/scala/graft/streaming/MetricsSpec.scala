package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.pipeline.Enrich
import graft.sources.StubJetStream

class MetricsSpec extends SparkSpec {

  private def post(i: Int): String =
    s"""{"uri":"at://m$i","cid":"mc$i","author":"a","text":"m m m join join join join","created_at":"2024-01-01T00:00:00Z"}"""

  test("listener surfaces backlog gauge, publish totals, and timeout taxonomy") {
    Seq("metrics-posts", "metrics-posts-enriched").foreach(StubJetStream.drop)
    val in = StubJetStream.ensure("metrics-posts", Seq("bluesky.posts.>"))
    (1 to 6).foreach(i => in.publish("bluesky.posts.x", post(i), s"at://m$i:mc$i"))
    val out = StubJetStream.ensure("metrics-posts-enriched", Seq("bluesky.enriched.>"))
    out.failNextPublishes = 1 // one transient timeout → retried, counted

    val listener = new MetricsListener
    spark.streams.addListener(listener)
    try {
      val q = StreamingEnrich.pipeline(
          spark.readStream.format("stub-nats")
            .option("stream", "metrics-posts")
            .option("subject", "bluesky.posts.>")
            .option("maxAckPending", "2").load())
        .select(col("subject"), col("raw_value").as("value"),
          concat_ws(":", col("uri"), col("cid")).as("msg_id"))
        .writeStream.format("stub-nats")
        .option("stream", "metrics-posts-enriched")
        .option("checkpointLocation",
          Files.createTempDirectory("metrics_ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    } finally spark.streams.removeListener(listener)

    assert(out.allMessages.length == 6)
    // A9: with 6 pending and ≤2 admitted per batch, intermediate
    // progress events must have shown a positive backlog
    assert(listener.maxBacklogNumPending > 0)
    // A1/A4 via the sink's ReportsSinkMetrics (cumulative gauges)
    assert(listener.gauge("posts_published_total") == 6)
    assert(listener.gauge("errors_publish_timeout_total") == 1)
    assert(listener.gauge("publish_duplicates_total") == 0)
    assert(listener.count("posts_processed_total") == 6)
  }

  test("typed path reports per-model inference latency (A6)") {
    val timers = Enrich.StageTimers(spark)
    val n = Enrich.enrichTyped(spark, Tables(spark, sf, "documents"),
      Some(timers)).count()
    assert(n > 0)
    assert(timers.rows.value == n)
    assert(timers.sentimentNs.value > 0)
    assert(timers.topicNs.value > 0)
    // sentiment ran on every non-blank doc, topic only on gate
    // survivors → sentiment was invoked at least as many times
    assert(timers.sentimentNs.count >= timers.topicNs.count)
  }
}
