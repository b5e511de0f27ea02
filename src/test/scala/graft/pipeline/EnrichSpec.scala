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

  test("Column path == typed path on adversarial random text (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // texts built from the actual marker alphabet + noise: marker chars
    // at string edges, repeats straddling the K threshold, whitespace
    // runs, empty-ish strings, unicode
    val frag = Gen.frequency(
      5 -> Gen.oneOf(StandIn.SentimentMarkers.map(_.toString)),
      5 -> Gen.oneOf(StandIn.TopicMarkers),
      3 -> Gen.oneOf(" ", "  ", "\t"),
      3 -> Gen.alphaNumStr.map(_.take(6)),
      1 -> Gen.oneOf("é", "漢", "🙂", ""))
    val textGen = Gen.listOf(frag).map(_.mkString(" "))
    val params = Gen.Parameters.default.withSize(30)
    val texts = (0 until 120).map(i => textGen.pureApply(params, Seed(900L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val colPath = Enrich.enrichColumns(df)
      .select("doc_id", "sentiment", "confidence", "p_negative", "p_neutral",
        "p_positive", "topics_str", "top_topic", "top_confidence", "subject")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val typedPath = Enrich.enrichTyped(spark, df)
      .collect().map(e => e.doc_id -> Seq(e.sentiment, e.confidence,
        e.p_negative, e.p_neutral, e.p_positive, e.topics_str, e.top_topic,
        e.top_confidence, e.subject)).toMap
    assert(colPath.keySet == typedPath.keySet)
    colPath.foreach { case (id, cols) =>
      assert(cols == typedPath(id), s"doc $id: '${texts(id.toInt)}'")
    }
  }

  test("whole enrichment plan is narrow: no shuffle (Exchange) anywhere") {
    val docs = Tables(spark, sf, "documents")
    val plan = Enrich.enrichColumns(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("enrichment expression tree stays inside WholeStageCodegen (no size fallback)") {
    // the round-1 perf collapse was this exact failure mode: a
    // regex-count tree too large for codegen, silently interpreted
    val docs = Tables(spark, sf, "documents")
    val exec = Enrich.enrichColumns(docs).queryExecution.executedPlan
    val plan = exec.toString
    // codegen'd operators print with a "*(stageId)" prefix
    assert(plan.contains("*("), plan)
    // every Project must sit inside a codegen stage — an unstarred
    // Project is interpreted row-at-a-time eval in the hot path
    val outside = plan.linesIterator
      .filter(l => l.contains("Project") && !l.contains("*(")).toList
    assert(outside.isEmpty, s"non-codegen Project stages:\n${outside.mkString("\n")}")
  }

  test("topics is never null/empty (P4 invariant) and explode stays plan-bounded") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents")
    val enriched = Enrich.enrichColumns(docs)
    // the invariant that lets e04/e05 use explode_outer and lets P4 be
    // subsumed by P2: F11 always puts top_topic into topics
    assert(enriched.filter(col("topics").isNull || size(col("topics")) === 0)
      .count() == 0L)
    // plan-size budget: an optimizer rule substituting the enrichment
    // tree into a pushed-down predicate (InferFiltersFromGenerate did —
    // 823 replace() copies, 186 KB plan, ~3 s fixed cost per run)
    // must not come back
    val opt = enriched.select(explode_outer(col("topics")).as("t"))
      .groupBy("t").count()
      .queryExecution.optimizedPlan.toString
    val replaces = "replace\\(".r.findAllIn(opt).size
    assert(opt.length < 30000, s"optimized plan blew up to ${opt.length} chars")
    assert(replaces < 60, s"marker-count tree duplicated: $replaces replace() calls")
  }
}
