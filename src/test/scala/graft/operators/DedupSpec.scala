package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables(spark, sf, "documents")

  test("exactDedup keeps the lowest doc_id of each duplicate group") {
    val d = docs.select($"doc_id", $"text").limit(10)
    val doubled = d.unionByName(
      d.select(($"doc_id" + 1000).as("doc_id"), $"text"))
    val out = Dedup.exactDedup(doubled).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(0) < 1000)) // originals survive
    assert(out.forall(_.getLong(2) == 2))   // every group has 2 members
  }

  test("exactDedup is idempotent") {
    val once = Dedup.exactDedup(docs).select("doc_id")
    val again = Dedup.exactDedup(
      once.join(docs, "doc_id").select("doc_id", "text"))
    assert(once.count() == again.count())
  }

  test("indexStats: a boilerplate cohort shows up as bucket skew") {
    // clean corpus: distinct vocab per doc → every (band, bh) key ~1
    val clean = (1 to 30).map(i =>
      (i.toLong, (1 to 20).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.writeNearDupIndex(clean, "graft_ixs_clean", numBuckets = 4)
    val sClean = Dedup.indexStats(spark, "graft_ixs_clean").first()
    // cohort: 15 identical docs collide in EVERY band → hot keys of 15
    val cohort = clean.unionByName((100 to 114).map(i =>
        (i.toLong, "common disclaimer text repeated verbatim across the" +
          " whole cohort every single time"))
      .toDF("doc_id", "text"))
    Dedup.writeNearDupIndex(cohort, "graft_ixs_hot", numBuckets = 4)
    val sHot = Dedup.indexStats(spark, "graft_ixs_hot").first()
    assert(sClean.getLong(2) <= 2, s"clean max_key ${sClean.getLong(2)}")
    assert(sHot.getLong(2) == 15, s"hot max_key ${sHot.getLong(2)}")
    assert(sHot.getDouble(4) > sClean.getDouble(4) * 3,
      s"skew did not move: ${sClean.getDouble(4)} -> ${sHot.getDouble(4)}")
  }

  test("cluster survivors: highest quality wins, not lowest id") {
    // a near-dup pair where the HIGHER id is the better copy (longer,
    // more varied) — the id convention would keep doc 1, the quality
    // policy must keep doc 2; doc 3 is a singleton and keeps itself
    val base = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val planted = Seq(
      1L -> (base + " x x x x x x x x"), // repetitive tail: lower quality
      2L -> (base + " beta gamma delta epsilon zeta eta theta iota"),
      3L -> (1 to 20).map(i => s"only$i").mkString(" ")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(planted, minJ = 0.3)
    assert(pairs.count() == 1) // 1-2 are a cluster, 3 is not
    val score = length(col("text")).cast("double") // stand-in quality
    val surv = Dedup.clusterSurvivors(planted, pairs, score)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    assert(surv(1L) == ((2L, 2L)), s"cluster kept ${surv(1L)}") // best copy
    assert(surv(3L) == ((3L, 1L))) // singleton survives as itself
  }

  test("prefix filtering reproduces the exact Jaccard join at every threshold") {
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the fixture corpus, two thresholds (the registered 0.5 and a
    // loose 0.2 where candidate pruning has to work much harder)
    for (t <- Seq(0.5, 0.2)) {
      val exact = pairSet(Dedup.ngramJaccardPairs(docs, minJ = t))
      val viaPrefix = pairSet(Dedup.prefixJaccardPairs(docs, minJ = t))
      assert(viaPrefix == exact, s"minJ=$t: prefix filter lost/added pairs")
      assert(exact.nonEmpty || t > 0.4) // the loose threshold must bite
    }
    // a boilerplate-heavy corpus — the shape that melts the plain
    // equi-join: 20 docs sharing one hot disclaimer + distinct bodies.
    // Rare-first ordering must keep the hot shingles out of prefixes
    // AND the result must still match the exact join.
    val boiler = (1 to 20).map { i =>
      (i.toLong, "standard legal disclaimer repeated verbatim on every " +
        "page of the site " + (1 to 12).map(j => s"body$i$j").mkString(" "))
    }.toDF("doc_id", "text")
    assert(pairSet(Dedup.prefixJaccardPairs(boiler, minJ = 0.5)) ==
      pairSet(Dedup.ngramJaccardPairs(boiler, minJ = 0.5)))
    // degenerate thresholds: t=1.0 → prefix length 1, exact-duplicate
    // pairs only; identical docs must still pair
    val twins = Seq((1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "totally different words here in this one document"))
      .toDF("doc_id", "text")
    val tw = pairSet(Dedup.prefixJaccardPairs(twins, minJ = 1.0))
    assert(tw.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("containment catches the subset duplicate Jaccard is blind to") {
    // a 16-token doc quoted verbatim inside a 60-token doc: every short
    // shingle appears in the long one → containment 1.0 exactly, while
    // Jaccard = 12/56 ≈ 0.21 sits far under any useful threshold
    val long = (1 to 60).map(i => s"word$i").mkString(" ")
    val short = (20 to 35).map(i => s"word$i").mkString(" ")
    val planted = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(planted, minC = 0.9).collect()
    assert(c.length == 1)
    assert((c(0).getLong(0), c(0).getLong(1)) == (1L, 2L))
    assert(c(0).getDouble(2) == 1.0)
    assert(Dedup.ngramJaccardPairs(planted, minJ = 0.5).isEmpty,
      "the Jaccard pass should miss the asymmetric pair")
    // containment dominates Jaccard (min ≤ union), so on the fixture
    // the containment pairs at θ contain the Jaccard pairs at θ
    val jf = Dedup.ngramJaccardPairs(docs, minJ = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cf = Dedup.containmentPairs(docs, minC = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jf.subsetOf(cf))
  }

  test("LSH band planner: deployed shape at 128 hashes, r rises with budget") {
    // 128-hash budget at J=0.5 → r=2 (b=49 needed for recall 1-1e-6);
    // the deployed b=64 spends the whole budget for recall above plan
    val p128 = Dedup.lshBandPlan(0.5)
    assert(p128.rowsPerBand == 2, p128.toString)
    assert(p128.rowsPerBand * p128.bands <= Dedup.NumHashes)
    assert(p128.recallAtThreshold >= 0.999999)
    val deployed = Dedup.lshCollisionProb(0.5, Dedup.RowsPerBand, Dedup.Bands)
    assert(deployed >= p128.recallAtThreshold)
    // a 512-hash budget affords r=3: same recall target, the
    // background candidate rate collapses ~4× — the petabyte lever
    val p512 = Dedup.lshBandPlan(0.5, maxHashes = 512)
    assert(p512.rowsPerBand > p128.rowsPerBand)
    assert(p512.recallAtThreshold >= 0.999999)
    assert(p512.rateAtBackground < p128.rateAtBackground / 2,
      s"${p512.rateAtBackground} vs ${p128.rateAtBackground}")
    // an infeasible demand fails fast instead of shipping a bad index
    intercept[IllegalArgumentException] {
      Dedup.lshBandPlan(0.1, targetRecall = 0.999999, maxHashes = 8)
    }
  }

  test("span redaction removes exactly the covered tokens, keeps every doc") {
    // eval doc = tokens 10..25 of a 40-token sequence; the train doc
    // quotes tokens 10..21 verbatim (12 tokens ⇒ 5 hit 8-grams at
    // offsets 10..14 of the train doc, covering positions 10..21)
    val evalDoc = (10 to 25).map(i => s"v$i").mkString(" ")
    val train = Seq(
      1L -> ((0 to 9) ++ (10 to 21)).map(i => s"v$i").mkString(" "),
      2L -> (100 to 130).map(i => s"v$i").mkString(" "), // clean
      3L -> evalDoc // fully contaminated (is the eval doc)
    ).toDF("doc_id", "text")
    val out = Dedup.redactContaminatedSpans(train,
        Seq(99L -> evalDoc).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: the quoted block (positions 10..21) vanishes, prefix stays
    assert(out(1L) == (((0 to 9).map(i => s"v$i").mkString(" "), 10L, 12L)))
    // doc 2: untouched, zero masked
    assert(out(2L)._2 == 31L && out(2L)._3 == 0L)
    assert(out(2L)._1 == (100 to 130).map(i => s"v$i").mkString(" "))
    // doc 3: nothing survives, but the row is still there
    assert(out(3L) == (("", 0L, 16L)))
  }

  test("removeDuplicateSpans: keep-one canonical, full copies collapse, uniques untouched") {
    // doc 1 and doc 2 share an 8-token boilerplate tile; doc 3 is a
    // verbatim copy of doc 1; doc 4 is all-unique text.
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val d1 = boiler + " " + (1 to 8).map(i => s"one$i").mkString(" ")
    val d4 = (1 to 16).map(i => s"four$i").mkString(" ")
    val in = Seq(
      (1L, d1),
      (2L, boiler + " " + (1 to 8).map(i => s"two$i").mkString(" ")),
      (3L, d1),
      (4L, d4)).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(in, k = 8)
      .orderBy("doc_id").collect()
    // doc 1 is canonical everywhere it collides → untouched
    assert(out(0).getAs[String]("clean_text") == d1)
    assert(out(0).getAs[Long]("n_kept") == 2)
    // doc 2 loses the boilerplate tile, keeps its own content
    assert(out(1).getAs[String]("clean_text") ==
      (1 to 8).map(i => s"two$i").mkString(" "))
    // doc 3 duplicates doc 1 tile-for-tile → collapses to empty
    assert(out(2).getAs[String]("clean_text") == "")
    assert(out(2).getAs[Long]("n_kept") == 0)
    assert(out(2).getAs[Long]("n_tiles") == 2)
    // doc 4 shares nothing → byte-identical
    assert(out(3).getAs[String]("clean_text") == d4)
  }

  test("removeDuplicateSpans: within-doc repetition keeps first occurrence") {
    val tile = (1 to 8).map(i => s"r$i").mkString(" ")
    val in = Seq((7L, tile + " " + tile + " " + tile)).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(in, k = 8).collect().head
    assert(out.getAs[Long]("n_tiles") == 3)
    assert(out.getAs[Long]("n_kept") == 1)
    assert(out.getAs[String]("clean_text") == tile)
  }

  test("removeDuplicateSpans: trailing partial tile participates in dedup") {
    // 12 tokens → tiles of 8 and 4; the 4-token tail of doc 1 is doc
    // 2's whole (short) text, so doc 2 collapses.
    val head = (1 to 8).map(i => s"h$i").mkString(" ")
    val tail = (1 to 4).map(i => s"t$i").mkString(" ")
    val in = Seq((1L, head + " " + tail), (2L, tail)).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(in, k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == head + " " + tail)
    assert(out(1).getAs[String]("clean_text") == "")
  }

  test("removeDuplicateSpansMerged: planted long passage survives contiguously at exactly one site") {
    // three docs share an aligned 3-tile passage behind unique 1-tile
    // prefixes; merged semantics keep the passage WHOLE in the lowest
    // doc and drop it whole elsewhere
    val passage = (1 to 24).map(i => s"p$i").mkString(" ")
    def pre(d: Int) = (1 to 8).map(i => s"pre${d}x$i").mkString(" ")
    val in = Seq(
      (10L, pre(10) + " " + passage),
      (20L, pre(20) + " " + passage),
      (30L, pre(30) + " " + passage)).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpansMerged(in, k = 8)
      .orderBy("doc_id").collect()
    // canonical site: prefix + the full contiguous passage
    assert(out(0).getAs[String]("clean_text") == pre(10) + " " + passage)
    assert(out(0).getAs[Long]("n_kept") == 4)
    // every other site drops the run whole — prefixes only, no fragment
    Seq(1, 2).foreach { r =>
      val t = out(r).getAs[String]("clean_text")
      assert(t == pre((r + 1) * 10), s"site $r kept a fragment: $t")
      assert(!t.contains("p1"), t)
    }
  }

  test("removeDuplicateSpansMerged: tile policy shreds a shared run, merged keeps it whole") {
    // X and Y are dup tiles whose TILE canonicals live in different
    // docs (X's in doc 0, Y's in doc 1), so the tile policy leaves the
    // contiguous X-Y passage of docs 5/6 surviving NOWHERE; the merged
    // policy keeps it contiguous in doc 5 (runs are the canonical
    // unit). This is exactly the ExactSubstr-semantics gap d20 closes.
    val x = (1 to 8).map(i => s"x$i").mkString(" ")
    val y = (1 to 8).map(i => s"y$i").mkString(" ")
    def f(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val in = Seq(
      (0L, x + " " + f("fa")),
      (1L, y + " " + f("fb")),
      (5L, f("fe") + " " + x + " " + y),
      (6L, f("fg") + " " + x + " " + y)).toDF("doc_id", "text")
    val xy = x + " " + y
    val tiled = Dedup.removeDuplicateSpans(in, k = 8)
      .orderBy("doc_id").collect().map(_.getAs[String]("clean_text"))
    assert(!tiled.exists(_.contains(xy)),
      s"tile policy unexpectedly kept X Y contiguous: ${tiled.mkString("|")}")
    val merged = Dedup.removeDuplicateSpansMerged(in, k = 8)
      .orderBy("doc_id").collect().map(_.getAs[String]("clean_text"))
    assert(merged.count(_.contains(xy)) == 1,
      s"merged policy should keep X Y contiguous exactly once: ${merged.mkString("|")}")
    assert(merged(2).contains(xy), s"doc 5 (lowest run site) should keep it: ${merged.mkString("|")}")
    // runs that differ as WHOLE spans are distinct canonical units: doc
    // 0's lone X and doc 1's lone Y keep their own (different) spans
    assert(merged(0) == x + " " + f("fa"))
    assert(merged(1) == y + " " + f("fb"))
  }

  test("minhash LSH finds the same pairs as exact Jaccard here") {
    val exact = Dedup.ngramJaccardPairs(docs)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("jaccard pairs are symmetric-free (a<b) and within [minJ,1]") {
    Dedup.ngramJaccardPairs(docs).collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("simhash of identical texts is identical; near-dups are close") {
    val pairs = Dedup.ngramJaccardPairs(docs, minJ = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    if (pairs.nonEmpty) {
      val sims = Dedup.simhashes(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      pairs.foreach { case (a, b) =>
        val ham = java.lang.Long.bitCount(sims(a) ^ sims(b))
        assert(ham <= 16, s"near-dup pair ($a,$b) hamming=$ham")
      }
    }
  }

  test("shingles of short docs fall back to the whole token list") {
    val tiny = Seq((1L, "only three words")).toDF("doc_id", "text")
    val sh = Dedup.shingles(tiny).collect()
    assert(sh.length == 1 && sh.head.getString(1) == "only three words")
  }

  test("dfCap prunes boilerplate-only pairs, keeps genuine near-dups") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // a genuine near-dup pair (docs 1, 2) plus ten unrelated docs that
    // all end with the same boilerplate disclaimer — the hot-shingle
    // pattern that makes the uncapped self-join quadratic at scale
    val boiler = "this message is confidential please delete if received in error"
    val body = (i: Long) => s"unique document body number $i talks about subject $i only"
    val planted = (
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "the quick brown fox jumps over the lazy dog today")) ++
        (10L to 19L).map(i => (i, s"${body(i)} $boiler"))
      ).toDF("doc_id", "text")
    val exact = pairs(Dedup.ngramJaccardPairs(planted, minJ = 0.2))
    // cap below the boilerplate df (10) but above any genuine shingle df
    val capped = pairs(Dedup.ngramJaccardPairs(planted, minJ = 0.2, dfCap = 5))
    assert(capped.contains((1L, 2L)), s"real near-dup lost: $capped")
    // every capped pair is also an exact pair (pruning only removes)
    assert(capped.subsetOf(exact), s"capped=$capped exact=$exact")
    // the boilerplate cohort pairs only via the hot shingles → pruned
    assert(!capped.exists { case (a, b) => a >= 10 && b >= 10 }, s"$capped")
    // an inert cap (above every df) reproduces the exact output
    assert(pairs(Dedup.ngramJaccardPairs(planted, minJ = 0.2, dfCap = 1000)) == exact)
  }

  test("decontaminate flags eval-overlapping docs and only those") {
    val mk = (i: Long, t: String) => (i, t)
    val evalDoc = "what is the capital of france paris is the capital of france"
    val train = Seq(
      mk(1L, s"quiz answer leaked verbatim $evalDoc end of page"), // contains an eval 8-gram
      mk(2L, "a perfectly clean training document about cooking pasta at home tonight"),
      mk(3L, evalDoc) // the eval doc itself in the corpus
    ).toDF("doc_id", "text")
    val evalSet = Seq(mk(100L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, evalSet).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // every train doc reported
    assert(out(1L)._2 && out(1L)._1 > 0, s"planted leak not flagged: $out")
    assert(!out(2L)._2 && out(2L)._1 == 0, s"clean doc flagged: $out")
    assert(out(3L)._2, s"verbatim eval doc not flagged: $out")
  }

  test("hammingPairs pigeonhole guarantee: every pair within Hamming ≤ 3 is found") {
    // 4 disjoint 16-bit blocks ⇒ a pair differing in ≤ 3 bits must
    // agree exactly on ≥ 1 block, so block-collision candidates can't
    // miss (this is the guarantee d04/m04 lean on). Seeded random
    // corpus + planted near pairs, both directions checked.
    val rnd = new scala.util.Random(42)
    val base = Seq.tabulate(60)(i => (i.toLong, rnd.nextLong()))
    val planted = base.take(20).map { case (i, h) =>
      var v = h
      (0 until 1 + rnd.nextInt(3)).foreach(_ => v ^= (1L << rnd.nextInt(64)))
      (1000L + i, v)
    }
    val df = (base ++ planted).toDF("doc_id", "h")
    val found = Dedup.hammingPairs(df, "doc_id", "h", maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = (base ++ planted)
    // completeness: every qualifying pair was found...
    for (Seq((ia, ha), (ib, hb)) <- all.combinations(2)) {
      if (java.lang.Long.bitCount(ha ^ hb) <= 3)
        assert(found.contains((math.min(ia, ib), math.max(ia, ib))),
          s"missed pair ($ia,$ib) hamming=${java.lang.Long.bitCount(ha ^ hb)}")
    }
    // ...and nothing else (soundness of the exact verify)
    val hs = all.toMap
    found.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3, s"bogus pair ($a,$b)")
    }
  }

  test("incremental near-dup: history matches drop, new docs survive, batch-internal dups don't disqualify") {
    val hist = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away tonight while everyone sleeps soundly"),
      (2L, "completely different historical text about cooking pasta in rome with fresh tomatoes and basil leaves")
    ).toDF("doc_id", "text")
    val novel = "entirely novel content with vocabulary never seen before in any archived document whatsoever"
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away tonight while everyone sleeps soundly tiny edit"),
      (11L, novel),
      (12L, novel) // exact twin of 11 WITHIN the batch: must still survive
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDupSurvivors(hist, batch)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(11L, 12L), s"got $out")
  }

  test("decontaminate counts are bounded by the doc's own span count") {
    val docs = Tables(spark, sf, "documents")
    Dedup.decontaminate(docs, docs.filter($"doc_id" % 17 === 0))
      .collect().foreach { r =>
        assert(r.getLong(2) <= r.getLong(1),
          s"n_contaminated > n_spans for doc ${r.getLong(0)}")
      }
  }

  test("bloom decontamination: flags superset of exact, bounded FPs, deterministic") {
    val docs = Tables(spark, sf, "documents")
    val evalSet = docs.filter($"doc_id" % 17 === 0)
    def flags(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val exact = flags(Dedup.decontaminate(docs, evalSet))
    val bloom = flags(Dedup.decontaminateBloom(docs, evalSet))
    // one-sided error: every exact-contaminated doc is bloom-flagged
    exact.foreach { case (id, ex) =>
      if (ex) assert(bloom(id), s"false negative on doc $id")
    }
    // doc-level FP rate among exact-clean docs stays under the d18 bound
    val clean = exact.filter(!_._2).keySet
    val fp = clean.count(bloom(_)).toDouble / math.max(clean.size, 1)
    assert(fp <= 0.05, s"doc-level FP rate $fp")
    // fixed-seed hashing: a rebuild produces identical flags
    assert(flags(Dedup.decontaminateBloom(docs, evalSet)) == bloom)
  }
}
