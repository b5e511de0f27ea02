package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property checks: the salted join and the binned band join are pure
  * plan rewrites — on ANY input they must produce exactly the rows of
  * their naive formulations. ScalaCheck generators drive the inputs
  * (deterministic seeds — the offline cache has no scalatest bridge, so
  * generation is invoked directly), including hot-key distributions
  * (the case salting exists for) and timestamps straddling bin edges
  * (the case binning could get wrong).
  */
class SkewBandJoinSpec extends SparkSpec {

  private val params = Gen.Parameters.default.withSize(60)
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(params, Seed(seed))

  // keys drawn from a tiny domain → heavy collisions, one dominant key
  private val hotKeyRows: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      k <- Gen.frequency(6 -> Gen.const(7L), 4 -> Gen.choose(0L, 4L))
      v <- Gen.choose(0L, 1000L)
    } yield (k, v))

  test("saltedInnerJoin == plain join on skewed inputs (property)") {
    import spark.implicits._
    for (trial <- 0 until 5; salt <- Seq(1, 3, 8)) {
      val left = sample(hotKeyRows, 100L + trial).toDF("k", "lv")
      val right = sample(hotKeyRows, 200L + trial).toDF("k", "rv")
      val plain = left.join(right, Seq("k"))
        .select("k", "lv", "rv").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val salted = SkewJoin.saltedInnerJoin(left, right, "k", salt)
        .select("k", "lv", "rv").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // multiset equality: duplicates matter in a join result
      assert(salted.groupBy(identity).view.mapValues(_.size).toMap ==
        plain.groupBy(identity).view.mapValues(_.size).toMap,
        s"trial=$trial salt=$salt")
    }
  }

  test("hotKeySaltedJoin == plain join across hot-set sizes (property)") {
    import spark.implicits._
    // thresholds sweep from "everything is hot" to "nothing is hot" —
    // the split must be row-invisible at every point in between
    for (trial <- 0 until 3; threshold <- Seq(1L, 5L, 1000000L)) {
      val left = sample(hotKeyRows, 400L + trial).toDF("k", "lv")
      val right = sample(hotKeyRows, 500L + trial).toDF("k", "rv")
      val plain = left.join(right, Seq("k"))
        .select("k", "lv", "rv").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val salted = SkewJoin.hotKeySaltedJoin(left, right, "k",
          salt = 4, hotThreshold = threshold)
        .select("k", "lv", "rv").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(salted.groupBy(identity).view.mapValues(_.size).toMap ==
        plain.groupBy(identity).view.mapValues(_.size).toMap,
        s"trial=$trial threshold=$threshold")
    }
  }

  test("hotKeySaltedJoin scans each input once and salts only hot keys") {
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LocalRelation, Union}
    import spark.implicits._
    // hot key 7 on both sides; cold keys 81..100 (left) overlap
    // 81..105 (right) on 81..100 so the cold population carries real rows
    val left = (1 to 100).map(i => (if (i <= 80) 7L else i.toLong, i.toLong))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (if (i <= 25) 7L else (i + 55).toLong, i.toLong))
      .toDF("k", "rv")
    val df = SkewJoin.hotKeySaltedJoin(left, right, "k",
      salt = 4, hotThreshold = 10L)
    val plan = df.queryExecution.optimizedPlan
    // single-scan contract: each fact input appears exactly once as a
    // leaf (the hot-key frame is a checkpointed RDD leaf, not a
    // LocalRelation, so counting LocalRelations counts the inputs) —
    // no semi/anti re-scans, no union of hot and cold branches
    val inputLeaves = plan.collect { case l: LocalRelation => l }
    assert(inputLeaves.size == 2,
      s"each input must be scanned once, got ${inputLeaves.size} input leaves")
    assert(plan.collect { case u: Union => u }.isEmpty,
      "single-join shape: no hot/cold union")
    // exactly one explode, and it consumes the flag join (the whole
    // right side tagged `_hot`), emitting salt replicas conditionally:
    // ×salt for hot rows, ×1 for cold rows
    val gens = plan.collect { case g: Generate => g }
    assert(gens.size == 1, s"expected one explode, got ${gens.size}")
    assert(gens.head.child.collect {
      case j: Join if j.joinType == LeftOuter => j
    }.nonEmpty, "salt explode must consume the broadcast hot-flag join")
    // one shuffle-able inner join on (key, salt); the two flag joins are
    // broadcast left-outers against the ≤maxHotKeys frame
    val joins = plan.collect { case j: Join => j }
    assert(joins.size == 3, s"expected 3 joins (2 flag + 1 salted), got ${joins.size}")
    assert(joins.count(_.joinType == LeftOuter) == 2)
    // replication is bounded by the hot subset: 80 hot + 20 cold left
    // rows and 25×4 hot + 25 cold right replicas — not |right|×salt
    // sanity on the rows themselves: hot key 7 joins 80×25 times, cold
    // keys 81..100 join 1:1
    val rows = df.select("k", "lv", "rv").collect()
    assert(rows.count(_.getLong(0) == 7L) == 80 * 25)
    assert(rows.length == 80 * 25 + 20)
  }

  test("sampled detection still catches the planted hot key; join stays exact") {
    import spark.implicits._
    // key 7 owns 400 of 500 left rows — the straggler shape detection
    // exists for. hotThreshold is in FULL-data units (40); at fraction
    // 0.25 the internal cut scales to 10 and the sampled count of a
    // genuinely hot key (~100 here) clears it with huge margin, while
    // cold keys (1 row each) stay under it
    val left = (1 to 500).map(i => (if (i <= 400) 7L else i.toLong, i.toLong))
      .toDF("k", "lv")
    val right = (1 to 60).map(i => (if (i <= 30) 7L else (i + 400).toLong, i.toLong))
      .toDF("k", "rv")
    val hot = SkewJoin.detectHotKeys(left, "k", hotThreshold = 40L,
        sampleFraction = 0.25, maxHotKeys = 100)
      .collect().map(_.getLong(0)).toSet
    assert(hot.contains(7L), s"planted hot key missed by sampled detection: $hot")
    assert(hot.size < 20, s"cold keys wrongly promoted: $hot")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val salted = SkewJoin.hotKeySaltedJoin(left, right, "k", salt = 4,
        hotThreshold = 40L, sampleFraction = 0.25).select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(salted.groupBy(identity).view.mapValues(_.size).toMap ==
      plain.groupBy(identity).view.mapValues(_.size).toMap)
  }

  test("map-typed payload columns don't break the salt (excluded from hash)") {
    import spark.implicits._
    // hashing a MapType is disallowed in Spark (map entry order is
    // undefined); the salt must skip map columns — at any nesting
    // depth — and still spread off the remaining ones
    val left = (1 to 100)
      .map(i => (if (i <= 80) 7L else i.toLong, i.toLong, Map("m" -> i)))
      .toDF("k", "lv", "props")
    val right = (1 to 20).map(i => (if (i <= 10) 7L else (i + 70).toLong, i.toLong))
      .toDF("k", "rv")
    for (df <- Seq(
        SkewJoin.saltedInnerJoin(left, right, "k", salt = 4),
        SkewJoin.hotKeySaltedJoin(left, right, "k", salt = 4, hotThreshold = 10L))) {
      val got = df.select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val plain = left.join(right, Seq("k")).select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        plain.groupBy(identity).view.mapValues(_.size).toMap)
    }
    // the hot rows really spread: key 7's 80 rows use more than one salt
    val salted = left.withColumn("_s",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"k", $"lv"), lit(4L)))
    assert(salted.filter($"k" === 7L).select("_s").distinct().count() > 1)
  }

  test("salted-join plans contain no nondeterministic expressions") {
    import spark.implicits._
    // the salt must be a pure function of row content: a task-retry
    // recompute of the salted map stage replays identical shuffle keys
    // (monotonically_increasing_id/rand here would re-salt rows after
    // some reducers consumed old output, dropping/duplicating pairs)
    val left = (1 to 100).map(i => (i % 5L, i.toLong)).toDF("k", "lv")
    val right = (1 to 20).map(i => (i % 5L, i.toLong)).toDF("k", "rv")
    for (df <- Seq(
        SkewJoin.saltedInnerJoin(left, right, "k", salt = 4),
        SkewJoin.hotKeySaltedJoin(left, right, "k", salt = 4, hotThreshold = 5L))) {
      val nondet = df.queryExecution.optimizedPlan.collect {
        case p => p.expressions.flatMap(_.collect {
          case e if !e.deterministic => e
        })
      }.flatten
      assert(nondet.isEmpty, s"nondeterministic expressions in plan: $nondet")
    }
  }

  // timestamps clustered near multiples of the band width, so pairs
  // regularly straddle bin boundaries; micros offsets hit the exact
  // |Δt| == band inclusive edge
  private val eventRows: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(for {
      user <- Gen.choose(0L, 3L)
      bin <- Gen.choose(0L, 5L)
      off <- Gen.oneOf(0L, 1L, 999999L, 1000000L, 1500000L, 1999999L)
    } yield (user, bin * 2000000L + off, 0L)).map(_.zipWithIndex.map {
      case ((u, us, _), i) => (u, us, i.toLong)
    })

  test("selfBandPairs == naive inequality join incl. exact-band edges (property)") {
    import spark.implicits._
    val bandSec = 2L // 2s band == the 2e6-micros bin width above
    for (trial <- 0 until 5) {
      val rows = sample(eventRows, 300L + trial)
      val df = rows.toDF("user_id", "us", "event_id")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val got = BandJoin.selfBandPairs(df, "user_id", "ts", "event_id", bandSec)
        .select("user_id", "id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = (for {
        (u1, t1, i1) <- rows; (u2, t2, i2) <- rows
        if u1 == u2 && i1 < i2 && math.abs(t2 - t1) <= bandSec * 1000000L
      } yield (u1, i1, i2)).toSet
      assert(got == expected, s"trial=$trial rows=${rows.size}")
    }
  }

  test("band join emits each qualifying pair exactly once") {
    import spark.implicits._
    // events in the same AND adjacent bins — the three-bin explode must
    // not double-count pairs whose candidate bins coincide
    val rows = Seq((1L, 0L, 1L), (1L, 500000L, 2L), (1L, 2000000L, 3L))
    val df = rows.toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = BandJoin.selfBandPairs(df, "user_id", "ts", "event_id", 2L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length)
    assert(got.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
