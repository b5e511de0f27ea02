package graft.pipeline

/** Deterministic stand-in text classifiers (SURVEY.md §7: no ONNX
  * runtime jar offline, so the pipeline runs a seedless, pure-function
  * model behind the same trait a real ONNX session would implement).
  *
  * The math is deliberately *portable*: integer marker counts plus
  * rational normalization (w_i / Σw), so the exact same semantics are
  * expressible both as Spark Columns (whole-stage codegen'd) and as
  * DuckDB oracle SQL — giving the enrichment DAG hash-exact correctness
  * checks, which the reference never had (SURVEY.md §5).
  *
  * Reference semantics mirrored here:
  *  - 3-class sentiment with per-class probabilities and a confidence
  *    gate (reference: /root/reference/src/sentiment.py:91-174)
  *  - 19-label multi-topic with threshold select, top-1, and the
  *    top-topic union fix-up (/root/reference/src/topic_classifier.py:161-182)
  */
object StandIn {

  // ---- sentiment (3-class; reference label order sentiment.py:35) ---
  val SentimentLabels: Array[String] = Array("negative", "neutral", "positive")
  /** One marker char per class; w_class = 1 + count(text, marker). */
  val SentimentMarkers: Array[Char] = Array('m', 'u', 'w')
  val SentimentThreshold = 0.4 // reference default (config.py:33)

  // ---- topics (19 labels of the public tweet-topic-21 model,
  //      topic_classifier.py id2label) -------------------------------
  val TopicLabels: Array[String] = Array(
    "arts_&_culture", "business_&_entrepreneurs", "celebrity_&_pop_culture",
    "diaries_&_daily_life", "family", "fashion_&_style", "film_tv_&_video",
    "fitness_&_health", "food_&_dining", "gaming", "learning_&_educational",
    "music", "news_&_social_concern", "other_hobbies", "relationships",
    "science_&_technology", "sports", "travel_&_adventure",
    "youth_&_student_life")
  /** One marker word per label; cnt_label = substring-occurrence count. */
  val TopicMarkers: Array[String] = Array(
    "join", "filter", "window", "stream", "hash", "scan", "merge", "agg",
    "sort", "table", "query", "group", "batch", "key", "row", "column",
    "vector", "data", "order")
  /** score = cnt/(cnt+K); score ≥ 0.5 ⇔ cnt ≥ K (integer decision —
    * no float-boundary risk). K plays the sigmoid-threshold role
    * (reference threshold 0.5, config.py:40). */
  val TopicK = 4

  def countChar(s: String, c: Char): Int = {
    var i = 0; var n = 0
    while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
    n
  }

  def countSub(s: String, sub: String): Int = {
    var i = 0; var n = 0
    while (true) {
      i = s.indexOf(sub, i)
      if (i < 0) return n
      n += 1; i += sub.length
    }
    n
  }

  /** Class weights: 1 + marker count (smoothing keeps Σw > 0). */
  def sentimentWeights(text: String): Array[Int] =
    SentimentMarkers.map(c => 1 + countChar(text, c))

  /** (label, confidence, probabilities[neg,neu,pos]). argmax ties break
    * toward the first label, matching np.argmax. */
  def sentiment(text: String): (String, Double, Array[Double]) = {
    val w = sentimentWeights(text)
    val tot = w.sum
    val probs = w.map(_.toDouble / tot)
    var best = 0
    var i = 1
    while (i < w.length) { if (w(i) > w(best)) best = i; i += 1 }
    (SentimentLabels(best), probs(best), probs)
  }

  def topicCounts(text: String): Array[Int] =
    TopicMarkers.map(m => countSub(text, m))

  /** (topics, top_topic, top_confidence) with the reference's exact
    * semantics: select cnt ≥ K in label order, top-1 by count (ties →
    * earlier label, matching stable sort-desc-take-head), then ensure
    * top_topic ∈ topics even when below threshold
    * (topic_classifier.py:179-182 — the F11 fix-up). */
  def topics(text: String): (Seq[String], String, Double) = {
    val cnt = topicCounts(text)
    val selected = TopicLabels.indices.filter(i => cnt(i) >= TopicK).map(TopicLabels(_))
    var best = 0
    var i = 1
    while (i < cnt.length) { if (cnt(i) > cnt(best)) best = i; i += 1 }
    val top = TopicLabels(best)
    val conf = cnt(best).toDouble / (cnt(best) + TopicK)
    val all = if (selected.contains(top)) selected else selected :+ top
    (all, top, conf)
  }
}

/** What a real inference backend would implement: batched text → scores.
  * `StandIn` backs the offline implementation; an ONNX-session-holding
  * implementation slots in unchanged where the runtime jar exists
  * (per-executor lazy singleton, ~1 intra-op thread per task —
  * SURVEY.md §4). */
trait TextClassifier extends Serializable {
  def labels: Seq[String]
  /** One score array per input text, batched per mapPartitions chunk. */
  def scores(texts: Seq[String]): Seq[Array[Double]]
}

/** Numeric helpers a logit-emitting model needs (reference
  * sentiment.py:22-25, topic_classifier.py:22-23). Unit-tested; the
  * stand-in itself uses rational normalization instead so its output is
  * reproducible in ANSI SQL. */
object Ml {
  def softmax(logits: Array[Double]): Array[Double] = {
    val m = logits.max
    val exps = logits.map(x => math.exp(x - m))
    val s = exps.sum
    exps.map(_ / s)
  }
  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
  def argmax(xs: Array[Double]): Int = {
    var best = 0
    var i = 1
    while (i < xs.length) { if (xs(i) > xs(best)) best = i; i += 1 }
    best
  }
}
