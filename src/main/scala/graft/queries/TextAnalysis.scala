package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Packing

/** Text-analysis operators over `documents` (north-star surface:
  * token counting, fingerprinting, language ID, quality scoring) —
  * all pure built-in-function plans, all DuckDB-oracle-exact. */
object TextAnalysis {

  val all: Seq[Q] = Seq(

    Q("t01_token_stats",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).as("len"),
            tokenCount(col("text")).as("n_tokens"),
            uniqueTokenCount(col("text")).as("n_uniq"),
            bpeTokenCount(col("text")).as("n_bpe"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CAST(length(text) AS INT) AS len,
        ${sqlTokenCount("text")} AS n_tokens,
        ${sqlUniqueTokenCount("text")} AS n_uniq,
        ${sqlBpeTokenCount("text")} AS n_bpe
        FROM documents ORDER BY doc_id NULLS FIRST""")),

    Q("t02_fingerprint",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${sqlFingerprint("text")} AS fp
        FROM documents ORDER BY doc_id NULLS FIRST""")),

    Q("t03_langid",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), langId(col("text")).as("lang_pred"))
          .groupBy("lang_pred").agg(count(lit(1)).as("n"))
          .orderBy("lang_pred"),
      Some(s"""SELECT ${sqlLangId("text")} AS lang_pred, count(*) AS n
        FROM documents GROUP BY lang_pred ORDER BY lang_pred NULLS FIRST""")),

    Q("t04_quality",
      (s, dir) =>
        Tables(s, dir, "documents")
          .filter(length(trim(col("text"))) > 0)
          .select(
            col("doc_id"),
            alphaRatio(col("text")).as("alpha_ratio"),
            uniqRatio(col("text")).as("uniq_ratio"),
            quality(col("text"), col("n_chars")).as("quality"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        ${sqlAlphaRatio("text")} AS alpha_ratio,
        ${sqlUniqRatio("text")} AS uniq_ratio,
        ${sqlQuality("text", "n_chars")} AS quality
        FROM documents WHERE length(trim(text)) > 0
        ORDER BY doc_id NULLS FIRST""")),

    // quality-gated corpus stats per source — the "filter a training
    // corpus" end-to-end shape
    Q("t05_quality_filter",
      (s, dir) =>
        Tables(s, dir, "documents")
          .filter(length(trim(col("text"))) > 0)
          .withColumn("quality", quality(col("text"), col("n_chars")))
          .filter(col("quality") >= 0.5)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               sum(tokenCount(col("text")).cast("long")).as("n_tokens"))
          .orderBy("source"),
      Some(s"""SELECT source, count(*) AS n_docs,
        CAST(sum(${sqlTokenCount("text")}) AS BIGINT) AS n_tokens
        FROM documents WHERE length(trim(text)) > 0
          AND ${sqlQuality("text", "n_chars")} >= 0.5
        GROUP BY source ORDER BY source NULLS FIRST""")),

    // within-document repetition: fraction of adjacent-token 2-grams
    // that duplicate an earlier one (the Gopher "duplicate n-gram"
    // quality signal — heavily repeated boilerplate scores high and
    // gets filtered from a training corpus)
    Q("t06_repetition",
      (s, dir) =>
        Tables(s, dir, "documents")
          .filter(tokenCount(col("text")) >= 2)
          // alias the bigram array once: zip_with is interpreted (no
          // codegen CSE), so letting each metric rebuild the tree would
          // tokenize every row ~10x; CollapseProject keeps the shared
          // alias because it's non-cheap and multiply referenced
          .select(col("doc_id"), bigrams(col("text")).as("bg"))
          .select(col("doc_id"),
            size(col("bg")).as("n_bigrams"),
            size(array_distinct(col("bg"))).as("n_uniq_bigrams"))
          .select(col("doc_id"), col("n_bigrams"), col("n_uniq_bigrams"),
            ((col("n_bigrams") - col("n_uniq_bigrams")) /
              col("n_bigrams").cast("double")).as("rep_ratio"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        ${sqlBigramCount("text")} AS n_bigrams,
        ${sqlUniqueBigramCount("text")} AS n_uniq_bigrams,
        ${sqlRepRatio("text")} AS rep_ratio
        FROM documents WHERE ${sqlTokenCount("text")} >= 2
        ORDER BY doc_id NULLS FIRST""")),

    // corpus-statistics quality scoring: familiarity = mean corpus
    // frequency of a document's tokens — the two-pass "build a model
    // from the corpus, score the corpus with it" pipeline shape (the
    // cheap cousin of KenLM perplexity filtering). Stays hash-exact
    // because everything is integer until ONE final double division
    // (float summation order would differ across engines; integer
    // sums are order-free).
    Q("t07_token_familiarity",
      (s, dir) => {
        val tok = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val freq = tok.groupBy("tok").agg(count(lit(1)).as("c"))
        val total = freq.agg(sum(col("c")).as("total"))
        tok.join(freq, "tok") // freq is |vocab|-sized; at corpus scale AQE picks the join side
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("fam_num"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("n_tokens"), col("fam_num"),
            (col("fam_num").cast("double") /
              (col("n_tokens").cast("double") * col("total").cast("double")))
              .as("familiarity"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok
          FROM documents),
        freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM freq),
        d AS (SELECT doc_id, count(*) AS n_tokens,
            CAST(sum(c) AS BIGINT) AS fam_num
          FROM tok JOIN freq USING (tok) GROUP BY doc_id)
        SELECT doc_id, n_tokens, fam_num,
          CAST(fam_num AS DOUBLE) /
            (CAST(n_tokens AS DOUBLE) * CAST(total AS DOUBLE)) AS familiarity
        FROM d, tot ORDER BY doc_id NULLS FIRST""")),

    // ---- t08: PII redaction (scrub pass before training) -------------
    // The synthetic corpus carries no PII, so every 7th doc gets a
    // deterministic planted email + 10-digit number (mirrored in the
    // oracle) — the redaction genuinely fires and the hash compare
    // covers both the rewritten text and the counts. Pure per-row
    // regexp plan: narrow, embarrassingly parallel at any scale.
    Q("t08_pii_redaction",
      (s, dir) =>
        Tables(s, dir, "documents")
          .withColumn("text2",
            when(col("doc_id") % 7 === 0,
              concat(col("text"), lit(" contact user"),
                col("doc_id").cast("string"), lit("@example.com tel 555"),
                (col("doc_id") + 1000000L).cast("string")))
              .otherwise(col("text")))
          .select(col("doc_id"),
            emailCount(col("text2")).as("n_emails"),
            digitRunCount(col("text2")).as("n_digit_runs"),
            redactPii(col("text2")).as("red_text"))
          .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@example.com tel 555' ||
            CAST(doc_id + 1000000 AS VARCHAR) ELSE text END AS text2
          FROM documents)
        SELECT doc_id, ${sqlEmailCount("text2")} AS n_emails,
          ${sqlDigitRunCount("text2")} AS n_digit_runs,
          ${sqlRedactPii("text2")} AS red_text
        FROM p ORDER BY doc_id NULLS FIRST""")),

    // ---- t09: sliding-window chunking (context-length splitting) -----
    // Long docs split into 64-token windows at stride 48 (16-token
    // overlap) — the shape every training pipeline uses to fit a
    // context length. Chunk count via integer arithmetic (no float
    // ceil), chunk identity as a fingerprint so the hash compare pins
    // the exact token partitioning. transform + posexplode keeps it
    // one narrow Generate — rows fan out, nothing shuffles.
    Q("t09_chunking",
      (s, dir) => {
        val W = 64; val S = 48
        Tables(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("n", size(col("toks")))
          .withColumn("n_chunks",
            expr(s"CASE WHEN n <= $W THEN 1 ELSE (n - $W + ${S - 1}) DIV $S + 1 END"))
          .select(col("doc_id"), col("n"),
            posexplode(expr(
              s"transform(sequence(0, n_chunks - 1), i -> array_join(slice(toks, i * $S + 1, $W), ' '))")))
          .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
            md5(col("col")).as("chunk_fp"),
            least(lit(W), col("n") - col("pos") * S).cast("int").as("n_chunk_toks"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${sqlTokens("text")} AS tk FROM documents),
          n AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
          c AS (SELECT doc_id, tk, n,
            CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 47) // 48 + 1 END AS n_chunks FROM n),
          e AS (SELECT doc_id, tk, n, unnest(range(0, n_chunks)) AS i FROM c)
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
          md5(array_to_string(tk[i * 48 + 1:i * 48 + 64], ' ')) AS chunk_fp,
          CAST(least(64, n - i * 48) AS INT) AS n_chunk_toks
        FROM e ORDER BY doc_id NULLS FIRST, chunk_idx NULLS FIRST""")),

    // ---- t10: TF-IDF keyword extraction ------------------------------
    // Top-3 characteristic terms per document. Corpus-stopwords (df >
    // 90% of docs) are dropped first — the df-threshold flavor of
    // stopword removal; a planted universal footer token (df = 100%)
    // proves the cut fires while the synthetic corpus's real tokens
    // (max df ≈ 80%) survive. idf here is the log-free N/df (ln() is
    // not bit-reproducible across engines; N/df induces a coarser but
    // deterministic ranking — ties broken by term so the hash compare
    // is exact). score = tf·N/df stays integer until ONE final double
    // division. Shape: tf agg on (doc_id, term), df agg derived from
    // tf (vocab-sized → AQE broadcasts the join), per-doc top-k via
    // the bounded KeywordTopK Aggregator — partial-aggregated, ≤ 3
    // rows per (partition, doc) reach the exchange; never a
    // row_number window (PlanSpec pins the absence).
    Q("t10_tfidf_terms",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"), lit(" corpusfooter")).as("text"))
        val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(df, "tok")
          .crossJoin(broadcast(n))
          .filter(col("df") * 10 <= col("n_docs") * 9)
          .withColumn("score",
            (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
        graft.operators.KeywordTopK.topTermsPerDoc(scored, 3)
          .orderBy("doc_id", "rank")
      },
      Some(s"""WITH d AS (SELECT doc_id, text || ' corpusfooter' AS text
          FROM documents),
        tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM d),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(*) AS n_docs FROM d),
        sc AS (SELECT doc_id, tok, tf, df,
            CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
          FROM tf JOIN df USING (tok), n
          WHERE df * 10 <= n_docs * 9),
        r AS (SELECT *, row_number()
            OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank FROM sc)
        SELECT doc_id, CAST(rank AS INT) AS rank, tok AS term, tf, df, score
        FROM r WHERE rank <= 3
        ORDER BY doc_id NULLS FIRST, rank NULLS FIRST""")),

    // ---- t11: sequence packing (pack-then-slice layout) --------------
    // GPT-style packing: concatenate the corpus in doc_id order, cut
    // every 256 tokens; each doc reports its global token offset and
    // first/last training sequence. The global prefix sum runs as a
    // two-phase distributed scan (Packing scaladoc) — the oracle's
    // un-partitioned window IS the single-reducer plan the operator
    // exists to avoid, which is fine for DuckDB at sf0.01 and exactly
    // why the Spark side doesn't use one (PlanSpec pins the absence).
    Q("t11_seq_packing",
      (s, dir) => {
        val counts = Tables(s, dir, "documents")
          .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
        Packing.packPlan(counts, "doc_id", "n_tokens", budget = 256)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
          CAST(${sqlTokenCount("text")} AS BIGINT) AS n_tokens FROM documents),
        c AS (SELECT doc_id, n_tokens,
            CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS start_tok
          FROM t)
        SELECT doc_id, n_tokens, start_tok,
          start_tok // 256 AS seq_first,
          greatest(start_tok // 256, (start_tok + n_tokens - 1) // 256) AS seq_last,
          CAST(start_tok % 256 AS INT) AS seq_offset
        FROM c ORDER BY doc_id NULLS FIRST""")),

    // ---- t12: bigram-LM scoring (KenLM-perplexity shape) -------------
    // The full CCNet-style "train an n-gram LM on the corpus, score
    // the corpus with it" loop, one level up from t07's unigram
    // familiarity: per document, the mean conditional probability
    // P(w2|w1) = c(w1 w2)/c(w1·) over its bigram occurrences. Rare
    // continuations drag the score down exactly like high perplexity
    // does; boilerplate scores near 1. Hash-exact because each
    // per-bigram probability is integer-scaled (micro-prob = cb·1e6
    // DIV cu — integral division both engines evaluate identically)
    // BEFORE the per-doc sum, so float summation order never enters;
    // ONE final double division produces the score.
    //
    // Scale: model pass = one partial-agg shuffle on the observed-
    // bigram key (vocab-sized, ≪ corpus); context counts derive from
    // the bigram counts (second, smaller agg) — the corpus is read
    // once. Score pass = exploded bigrams ⋈ model on the bigram key
    // (AQE sizes the join; the model side is skew-free by
    // construction) then a per-doc partial agg. No window, no
    // driver-side state.
    Q("t12_bigram_lm",
      (s, dir) => {
        val bg = Tables(s, dir, "documents")
          .filter(tokenCount(col("text")) >= 2)
          .select(col("doc_id"), explode(bigrams(col("text"))).as("bg"))
        val cb = bg.groupBy("bg").agg(count(lit(1)).as("cb"))
        val model = cb
          .withColumn("w1", substring_index(col("bg"), " ", 1))
        val cu = model.groupBy("w1").agg(sum(col("cb")).as("cu"))
        val probs = model.join(cu, "w1")
          .select(col("bg"), expr("cb * 1000000L DIV cu").as("micro_p"))
        bg.join(probs, "bg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
               sum(col("micro_p")).as("lm_num"))
          .select(col("doc_id"), col("n_bigrams"), col("lm_num"),
            (col("lm_num").cast("double") /
              (col("n_bigrams").cast("double") * 1e6)).as("lm_score"))
          .orderBy("doc_id")
      },
      Some(s"""WITH bg AS (SELECT doc_id, unnest(${sqlBigrams("text")}) AS bg
          FROM documents WHERE ${sqlTokenCount("text")} >= 2),
        cb AS (SELECT bg, count(*) AS cb FROM bg GROUP BY bg),
        m AS (SELECT bg, cb, split_part(bg, ' ', 1) AS w1 FROM cb),
        cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM m GROUP BY w1),
        p AS (SELECT bg, cb * 1000000 // cu AS micro_p
          FROM m JOIN cu USING (w1)),
        d AS (SELECT doc_id, count(*) AS n_bigrams,
            CAST(sum(micro_p) AS BIGINT) AS lm_num
          FROM bg JOIN p USING (bg) GROUP BY doc_id)
        SELECT doc_id, n_bigrams, lm_num,
          CAST(lm_num AS DOUBLE) /
            (CAST(n_bigrams AS DOUBLE) * 1e6) AS lm_score
        FROM d ORDER BY doc_id NULLS FIRST""")),

    // ---- t13: LM-score corpus PARTITION (the CCNet head/middle/tail) -
    // t12's model, acted on: every doc gets an integer micro-score
    // (mean in-corpus bigram probability, micro-scaled) and the corpus
    // splits into head (score > 1.03× the corpus mean), tail (< 0.97×)
    // and middle — the standard perplexity-bucketed curation step
    // (CCNet trains wiki-LM perplexity buckets; the in-corpus bigram
    // LM is the offline-constraint stand-in with identical plumbing —
    // its in-corpus scores cluster tightly around the mean, hence the
    // ±3%% bounds; a real wiki-LM spreads decades of perplexity).
    // The mean comparison is cross-multiplied into PURE INTEGER
    // arithmetic (score·2·n vs Σ and score·2·n vs 3·Σ) so the bucket
    // boundaries carry zero float-order risk cross-engine. Plan: t12's
    // two aggs + one scalar agg riding a broadcast + a narrow CASE —
    // no window, corpus read once.
    Q("t13_lm_partition",
      (s, dir) => {
        val bg = Tables(s, dir, "documents")
          .filter(tokenCount(col("text")) >= 2)
          .select(col("doc_id"), explode(bigrams(col("text"))).as("bg"))
        val cb = bg.groupBy("bg").agg(count(lit(1)).as("cb"))
        val model = cb
          .withColumn("w1", substring_index(col("bg"), " ", 1))
        val cu = model.groupBy("w1").agg(sum(col("cb")).as("cu"))
        val probs = model.join(cu, "w1")
          .select(col("bg"), expr("cb * 1000000L DIV cu").as("micro_p"))
        val scored = graft.operators.Frontier.pin(bg.join(probs, "bg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nb"), sum(col("micro_p")).as("num"))
          .select(col("doc_id"), expr("num DIV nb").as("micro_score")))
        val tot = scored.agg(sum(col("micro_score")).as("tot"),
          count(lit(1)).as("n"))
        scored.crossJoin(broadcast(tot))
          .select(col("doc_id"), col("micro_score"),
            when(col("micro_score") * col("n") * 100 < col("tot") * 97, "tail")
              .when(col("micro_score") * col("n") * 100 > col("tot") * 103, "head")
              .otherwise("middle").as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH bg AS (SELECT doc_id, unnest(${sqlBigrams("text")}) AS bg
          FROM documents WHERE ${sqlTokenCount("text")} >= 2),
        cb AS (SELECT bg, count(*) AS cb FROM bg GROUP BY bg),
        m AS (SELECT bg, cb, split_part(bg, ' ', 1) AS w1 FROM cb),
        cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM m GROUP BY w1),
        p AS (SELECT bg, cb * 1000000 // cu AS micro_p
          FROM m JOIN cu USING (w1)),
        d AS (SELECT doc_id,
            CAST(CAST(sum(micro_p) AS BIGINT) // count(*) AS BIGINT)
              AS micro_score
          FROM bg JOIN p USING (bg) GROUP BY doc_id),
        t AS (SELECT CAST(sum(micro_score) AS BIGINT) AS tot,
            CAST(count(*) AS BIGINT) AS n FROM d)
        SELECT doc_id, micro_score,
          CASE WHEN micro_score * n * 100 < tot * 97 THEN 'tail'
               WHEN micro_score * n * 100 > tot * 103 THEN 'head'
               ELSE 'middle' END AS bucket
        FROM d, t ORDER BY doc_id NULLS FIRST""")),
  )
}
