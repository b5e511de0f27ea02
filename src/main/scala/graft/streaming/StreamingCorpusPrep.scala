package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing, Sampling}

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

  // ---- stages 4-5 on a stream: the boundary, made explicit ----------
  //
  // Stage 4 (mixture) is rate-gated and the gate itself is a PURE
  // per-row predicate (md5-of-key) — it streams as a narrow filter
  // with no state. What does NOT stream is q27's temperature RATE
  // DERIVATION: (c_min/c_s)^α needs the per-stratum counts of the
  // WHOLE corpus, and an unbounded stream never closes that total. A
  // production pipeline derives the rates OFFLINE (q27 over
  // yesterday's corpus — they drift on corpus timescales, not
  // micro-batch timescales) and ships them to the stream as static
  // config; [[mixtureGate]] below is exactly that shape, and its kept
  // set provably equals the batch gate at the same rates
  // (StreamingCorpusPrepSpec). When the mixture is specified as TOKEN
  // BUDGETS instead of rates (q30's contract), the stateful
  // [[TokenBudgetGate]] is the streaming stage 4: per-stratum running
  // totals carried across micro-batches, q30-exact when an epoch
  // closes in one batch.
  //
  // Stage 5 (sequence packing) is BATCH-SHAPED, irreducibly: a doc's
  // global token offset is a prefix sum over a TOTAL ORDER of the
  // corpus, and every later insertion shifts every later offset — on
  // an unbounded stream the answer for any doc is never final, so a
  // "streaming global pack" is not an operator, it's a contradiction
  // (same reason t11/q29 are the two-phase scan, not a window: the
  // order must be closed before positions exist). The production
  // bridge is EPOCHS: close an ingest window (a micro-batch, an hour,
  // a nightly run), pack the closed set with the batch operator, emit
  // (epoch, packed layout). [[packEpochs]] composes exactly that in
  // foreachBatch; each epoch's output is bit-identical to running
  // batch t11 on that epoch's rows (parity-tested), and a trainer
  // consumes epochs in order.

  /** Stage 4 for streams: the q22-style static-rate mixture gate over
    * an engine-derived language id. Stateless and narrow — safe under
    * retries because the gate is a pure function of doc_id. */
  def mixtureGate(kept: DataFrame, rates: Seq[(String, Double)],
      salt: String): DataFrame =
    Sampling.mixtureSample(
      kept.withColumn("lang", TextFunctions.langId(col("text"))),
      col("doc_id"), col("lang"), rates, salt)

  /** Stage 5's epoch bridge: pack each closed micro-batch of
    * (doc_id, n_tokens) with the batch two-phase-scan planner and hand
    * `sink` the per-epoch layout (epoch column appended). */
  def packEpochs(tokenCounts: DataFrame, budget: Int)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (b, epoch) => {
      val packed = Packing.packPlan(b.toDF(), "doc_id", "n_tokens", budget)
        .withColumn("epoch", lit(epoch))
      sink(packed, epoch)
    }
    tokenCounts.writeStream.outputMode("append").foreachBatch(step).start()
  }
}
