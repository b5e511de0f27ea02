package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("Column path and typed mapPartitions path agree bit-for-bit") {
    val docs = Tables(spark, sf, "documents")
    val a = Enrich.enrichColumns(docs)
      .select("doc_id", "sentiment", "confidence", "topics_str",
        "top_topic", "top_confidence", "subject")
      .orderBy("doc_id").collect()
    val b = Enrich.enrichTyped(spark, docs).toDF()
      .select("doc_id", "sentiment", "confidence", "topics_str",
        "top_topic", "top_confidence", "subject")
      .orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("text extraction probes text, record.text, content, body, message in order") {
    val df = Seq(
      ("has-text", Some("T"), None: Option[String], None: Option[String]),
      ("content-only", None, Some("C"), None),
      ("body-only", None, None, Some("B")),
      ("blank-text-falls-through", Some("   "), Some("C2"), None),
      ("none", None, None, None)
    ).toDF("id", "text", "content", "body")
    val got = df.select($"id", Enrich.extractText(df).as("t")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("has-text") == "T")
    assert(got("content-only") == "C")
    assert(got("body-only") == "B")
    assert(got("blank-text-falls-through") == "C2") // blank probes onward
    assert(got("none") == "")
  }

  test("nested record.text is probed when a record struct exists") {
    val df = spark.read.json(Seq(
      """{"id":"nested","record":{"text":"NT"}}""",
      """{"id":"flat","text":"FT","record":{"text":"ignored"}}""").toDS())
    val got = df.select($"id", Enrich.extractText(df).as("t")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("nested") == "NT")
    assert(got("flat") == "FT") // top-level text wins
  }

  test("blank texts are filtered before any model runs (P2)") {
    val df = Seq((1L, "  "), (2L, ""), (3L, "m u w join")).toDF("doc_id", "text")
    assert(Enrich.enrichColumns(df).count() <= 1)
  }

  test("subject routing is output_prefix.sentiment.top_topic (P6)") {
    val df = Seq((1L, "m m m join join join join")).toDF("doc_id", "text")
    val r = Enrich.enrichColumns(df).select("subject", "sentiment", "top_topic")
      .collect().head
    assert(r.getString(0) == s"bluesky.enriched.${r.getString(1)}.${r.getString(2)}")
  }

  test("enrichment preserves passthrough input columns (P5 spread)") {
    val df = Seq((1L, "m m m", "extra-value")).toDF("doc_id", "text", "custom_field")
    val out = Enrich.enrichColumns(df)
    assert(out.columns.contains("custom_field"))
    if (out.count() > 0)
      assert(out.select("custom_field").collect().head.getString(0) == "extra-value")
  }

  test("whole enrichment plan is narrow: no shuffle (Exchange) anywhere") {
    val docs = Tables(spark, sf, "documents")
    val plan = Enrich.enrichColumns(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
