package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.pipeline.Enrich

/** The reference's enrichment pipeline (SURVEY.md §2.2-2.4) in batch
  * mode over `documents`, plus its observability side-DAG (A2/A3/A5/A8)
  * — every one DuckDB-oracle-checked via the generated CTE. */
object Enrichment {

  private val cte = Enrich.oracleCte()

  private def enriched(s: org.apache.spark.sql.SparkSession, dir: String) =
    Enrich.enrichColumns(Tables(s, dir, "documents"))

  val all: Seq[Q] = Seq(

    // ---- full enrichment projection (P1-P6, F1-F12), Column path ----
    Q("e01_enrich",
      (s, dir) =>
        enriched(s, dir)
          .select("doc_id", "sentiment", "confidence", "p_negative",
            "p_neutral", "p_positive", "topics_str", "top_topic",
            "top_confidence", "subject")
          .orderBy("doc_id"),
      Some(s"""$cte SELECT * FROM enriched ORDER BY doc_id NULLS FIRST""")),

    // ---- same DAG via typed mapPartitions (ONNX deployment shape) ---
    Q("e02_enrich_typed",
      (s, dir) =>
        Enrich.enrichTyped(s, Tables(s, dir, "documents"))
          .toDF().orderBy("doc_id"),
      Some(s"""$cte SELECT * FROM enriched ORDER BY doc_id NULLS FIRST""")),

    // ---- A2: grouped counter by sentiment ---------------------------
    Q("e03_sentiment_counts",
      (s, dir) =>
        enriched(s, dir).groupBy("sentiment")
          .agg(count(lit(1)).as("n"))
          .orderBy("sentiment"),
      Some(s"""$cte SELECT sentiment, count(*) AS n FROM enriched
        GROUP BY sentiment ORDER BY sentiment NULLS FIRST""")),

    // ---- A3: per-element topic counts (explode = the Generator op) --
    // explode_outer, not explode: F11 guarantees `topics` is non-empty
    // (it always contains top_topic), so the two are row-identical —
    // but plain explode triggers InferFiltersFromGenerate, whose
    // inferred `size(topics) > 0 AND topics IS NOT NULL` predicate is
    // pushed below the projections with the WHOLE topic expression
    // tree substituted in twice (measured: 823 replace() calls in one
    // Filter node, 186 KB plan, ~3 s fixed cost, ~40 redundant
    // full-text scans per row at scale)
    Q("e04_topic_counts",
      (s, dir) =>
        enriched(s, dir)
          .select(explode_outer(col("topics")).as("topic"))
          .groupBy("topic").agg(count(lit(1)).as("n"))
          .orderBy("topic"),
      Some(s"""$cte, ex AS (
          SELECT unnest(string_split(topics_str, ',')) AS topic FROM enriched)
        SELECT topic, count(*) AS n FROM ex
        GROUP BY topic ORDER BY topic NULLS FIRST""")),

    // ---- A8: top-5 topics (sort + limit over the counter) -----------
    Q("e05_top5_topics",
      (s, dir) =>
        enriched(s, dir)
          .select(explode_outer(col("topics")).as("topic")) // see e04
          .groupBy("topic").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("topic"))
          .limit(5),
      Some(s"""$cte, ex AS (
          SELECT unnest(string_split(topics_str, ',')) AS topic FROM enriched)
        SELECT topic, count(*) AS n FROM ex GROUP BY topic
        ORDER BY n DESC NULLS LAST, topic NULLS FIRST LIMIT 5""")),

    // ---- A5: fixed-bucket confidence histogram ----------------------
    Q("e06_confidence_histogram",
      (s, dir) =>
        enriched(s, dir)
          .withColumn("bucket", floor(col("confidence") * 10) / lit(10.0))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some(s"""$cte SELECT floor(confidence * 10) / 10.0 AS bucket,
        count(*) AS n FROM enriched GROUP BY bucket
        ORDER BY bucket NULLS FIRST""")),

    // ---- F12: wire-format serialization (nats_client.py:235) --------
    // The actual bytes a NATS sink publishes: subject-keyed compact
    // JSON + the idempotency key (Nats-Msg-Id analog). Long/string
    // fields only — double wire formatting differs across engines and
    // the doubles are already hash-checked via parquet in e01.
    Q("e08_wire_format",
      (s, dir) =>
        enriched(s, dir)
          .select(col("doc_id"), col("subject"),
            to_json(struct(col("doc_id"), col("sentiment"),
              col("topics_str"), col("top_topic"), col("subject")))
              .as("payload"),
            concat_ws(":", lit("doc"), col("doc_id")).as("msg_id"))
          .orderBy("doc_id"),
      Some(s"""$cte SELECT doc_id, subject,
          to_json(struct_pack(doc_id := doc_id, sentiment := sentiment,
            topics_str := topics_str, top_topic := top_topic,
            subject := subject))::VARCHAR AS payload,
          'doc:' || doc_id AS msg_id
        FROM enriched ORDER BY doc_id NULLS FIRST""")),

    // ---- P6: routing-subject distribution (the sink partitioning) ---
    Q("e07_routing",
      (s, dir) =>
        enriched(s, dir).groupBy("subject")
          .agg(count(lit(1)).as("n"))
          .orderBy("subject"),
      Some(s"""$cte SELECT subject, count(*) AS n FROM enriched
        GROUP BY subject ORDER BY subject NULLS FIRST""")),
  )
}
