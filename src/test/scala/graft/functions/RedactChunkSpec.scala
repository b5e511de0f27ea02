package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}
import graft.functions.TextFunctions._

/** Semantics of the t08 scrub pass and the t09 chunker beyond what the
  * DuckDB hash pins: redaction placement/idempotence, and the chunk
  * windows jointly covering every token at the declared stride. */
class RedactChunkSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails and long digit runs, leaves clean text alone") {
    val rows = Seq(
      (1L, "write to jane.doe+x@mail.example.org today"),
      (2L, "call 5551234567 or 12345678901 now"),
      (3L, "short code 555 and year 2024 stay"),
      (4L, "mixed bob@x.io then 9876543 done")
    ).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"), redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write to <email> today")
    assert(out(2L) == "call <digits> or <digits> now")
    assert(out(3L) == "short code 555 and year 2024 stay") // under 7 digits
    assert(out(4L) == "mixed <email> then <digits> done")
    // idempotent: placeholders contain no email/digit-run shapes
    val again = rows.select(redactPii(redactPii(col("text"))).as("r"))
      .collect().map(_.getString(0)).toSet
    assert(again == out.values.toSet)
  }

  test("chunking covers every token: windows reassemble the document") {
    val out = SparkEntry.queries("t09_chunking")(spark, sf)
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = out.select("doc_id", "chunk_idx", "n_chunk_toks")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    chunks.foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_._2)
      // indexes are dense from 0
      assert(sorted.map(_._2).toSeq == (0 until sorted.length))
      // stride-48 windows of ≤64 tokens: chunk i starts at 48·i, so the
      // last token covered is 48·i + n_chunk_toks; the final chunk must
      // reach exactly n (full coverage, no orphan tail)
      val (_, lastIdx, lastLen) = sorted.last
      assert(48 * lastIdx + lastLen == n, s"doc $id: $n tokens, last chunk ends at ${48 * lastIdx + lastLen}")
      // every non-final chunk is a full 64-token window
      sorted.init.foreach { case (_, _, len) => assert(len == 64) }
    }
  }
}
