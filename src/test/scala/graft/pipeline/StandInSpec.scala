package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class StandInSpec extends AnyFunSuite {

  /** Property-check helper (scalatestplus bridge unavailable offline). */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("sentiment probabilities sum to 1 and confidence is their max") {
    forAll(Gen.asciiPrintableStr) { t =>
      val (_, conf, probs) = StandIn.sentiment(t)
      assert(math.abs(probs.sum - 1.0) < 1e-12)
      assert(conf == probs.max)
      assert(probs.forall(p => p > 0 && p <= 1))
    }
  }

  test("sentiment argmax ties break toward the first label (np.argmax)") {
    // empty text → all weights 1 → tie → first label
    assert(StandIn.sentiment("")._1 == "negative")
  }

  test("topics always contain top_topic (F11 union fix-up)") {
    forAll(Gen.asciiPrintableStr) { t =>
      val (topics, top, _) = StandIn.topics(t)
      assert(topics.contains(top))
    }
  }

  test("F11 edge: top topic below threshold is still appended") {
    // one 'join' (< K=4 occurrences) and nothing else → no selected
    // topics, yet top must be arts_&_culture and appear in topics
    val (topics, top, conf) = StandIn.topics("join")
    assert(top == "arts_&_culture")
    assert(topics == Seq("arts_&_culture"))
    assert(conf == 1.0 / (1 + StandIn.TopicK))
  }

  test("topic selection: cnt >= K <=> score >= 0.5") {
    val text = Seq.fill(StandIn.TopicK)("join").mkString(" ")
    val (topics, top, conf) = StandIn.topics(text)
    assert(top == "arts_&_culture" && topics.head == "arts_&_culture")
    assert(conf == 0.5) // cnt=K → K/(K+K)
  }

  test("raising the sentiment threshold never adds rows (monotone gate)") {
    val texts = Seq("m m m", "u u w", "window stream", "", "mix of museum")
    def survivors(thr: Double) =
      texts.count(t => t.trim.nonEmpty && StandIn.sentiment(t)._2 >= thr)
    val s1 = survivors(0.3); val s2 = survivors(0.4); val s3 = survivors(0.5)
    assert(s1 >= s2 && s2 >= s3)
  }

  test("softmax is a distribution, stable under large logits") {
    val p = Ml.softmax(Array(1000.0, 1001.0, 999.0))
    assert(math.abs(p.sum - 1.0) < 1e-12)
    assert(p(1) > p(0) && p(0) > p(2))
  }

  test("sigmoid bounds and midpoint") {
    assert(Ml.sigmoid(0.0) == 0.5)
    assert(Ml.sigmoid(100.0) > 0.999 && Ml.sigmoid(-100.0) < 0.001)
  }

  test("countSub counts non-overlapping occurrences like SQL replace") {
    assert(StandIn.countSub("aaa", "aa") == 1)
    assert(StandIn.countSub("join join join", "join") == 3)
    assert(StandIn.countSub("", "x") == 0)
  }
}
