package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** The corpus-prep FRONT DOOR (p01 stages 1–3) as one Structured
  * Streaming query: quality gate → exact dedup → decontamination flag,
  * over a document stream instead of a static table. The reference is
  * a streaming system; this proves the batch pipeline's operators
  * compose under `readStream` with the same semantics (StreamingCorpus
  * PrepSpec replays a fixture through both paths and asserts the kept
  * sets match).
  *
  * Stage mapping, batch → stream:
  *  - quality gate: identical narrow filter (no state);
  *  - exact dedup: the fingerprint plays the JetStream msg-id and
  *    [[DedupWindow]] plays the duplicate window — first occurrence
  *    passes, later copies inside the window drop. Within a
  *    micro-batch "first" is min event time (tie → payload, which
  *    embeds the zero-padded doc_id), so an append-in-event-order
  *    ingest keeps exactly the batch pipeline's min-doc_id survivor;
  *  - decontamination: the eval n-gram universe is tiny vs the corpus
  *    (d10's broadcast argument), so it rides into every task as ONE
  *    collected set and the flag is a narrow per-row `arrays_overlap`
  *    — no stream-side shuffle, no state. (The batch path's
  *    broadcast-join-then-count re-derives the same flag; a streaming
  *    per-doc count would need a stateful re-aggregation for nothing
  *    the flag doesn't already give.)
  *
  * State footprint: one ValueState + one timer per distinct
  * fingerprint inside the window horizon — bounded by the window,
  * never by stream length (DedupWindow's contract).
  */
object StreamingCorpusPrep {

  /** `docs` streaming frame with (doc_id, text, n_chars, ts);
    * `evalSet` static benchmark docs with (doc_id, text). Returns the
    * kept stream (doc_id, text, ts, contaminated). */
  def frontDoor(spark: SparkSession, docs: DataFrame, evalSet: DataFrame,
      window: Duration = Duration.ofSeconds(600),
      delay: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    // 1. quality gate — the exact p01 stage-1 predicate
    val quality = docs.filter(length(trim(col("text"))) > 0)
      .filter(TextFunctions.quality(col("text"), col("n_chars")) >= 0.5)
    // 2. fingerprint-keyed duplicate window; payload carries the row
    //    (zero-padded doc_id so the tie-break is numeric id order)
    val msgs = quality.select(
        TextFunctions.fingerprint(col("text")).as("msg_id"),
        concat(lpad(col("doc_id").cast("string"), 12, "0"), lit("\t"),
          col("text")).as("payload"),
        col("ts")).as[DedupWindow.Msg]
    val kept = DedupWindow.dedup(spark, msgs, window, delay)
    // 3. decontamination flag vs the broadcast eval 8-gram universe
    val evalSh = Dedup.shingles(evalSet, k = 8)
      .agg(collect_set(col("sh")).as("eval_sh"))
    kept.toDF()
      .select(split(col("payload"), "\t", 2).as("p"), col("ts"))
      .select(col("p").getItem(0).cast("long").as("doc_id"),
        col("p").getItem(1).as("text"), col("ts"))
      .join(broadcast(evalSh))
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("contaminated",
        arrays_overlap(Dedup.shingleExpr(8), col("eval_sh")))
      .select("doc_id", "text", "ts", "contaminated")
  }
}
