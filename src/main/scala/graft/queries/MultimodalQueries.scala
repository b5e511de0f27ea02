package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.AsOfJoin

/** Multimodal-column queries (binary payload + typed metadata; decode
  * stubbed deterministically per the brief) and the as-of join —
  * checked against DuckDB's native ASOF JOIN. */
object MultimodalQueries {

  /** The m04/m06 fixture: real docs plus exact clones under shifted
    * ids (multiple of 3 keeps media_type assignment stable; ~1e9
    * clears real ids at any supported SF). */
  private def doubledDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.select((col("doc_id") + 1000000002L).as("doc_id"), col("text")))
  }

  /** Oracle CTEs ending at `sh(doc_id, h)` — the avg-hash replayed in
    * DuckDB byte arithmetic (shared by m04 and m06). */
  private val phashCtes =
    """d2 AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000002, text FROM documents),
        img AS (SELECT doc_id, hex(encode(text)) AS hx FROM d2 WHERE doc_id % 3 = 0),
        byt AS (SELECT doc_id, unnest(range(0, length(hx) // 2)) AS i, hx FROM img),
        bv AS (SELECT doc_id, i % 64 AS j,
            (strpos('0123456789ABCDEF', substr(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
            + (strpos('0123456789ABCDEF', substr(hx, CAST(2 * i + 2 AS INT), 1)) - 1) AS v
          FROM byt),
        sums AS (SELECT doc_id, j, sum(v) AS s FROM bv GROUP BY doc_id, j),
        mn AS (SELECT doc_id, sum(s) // 64 AS mean FROM sums GROUP BY doc_id),
        sh AS (SELECT s.doc_id,
            sum(CASE WHEN s.s > m.mean THEN (1::HUGEINT << CAST(s.j AS INT))
                ELSE 0::HUGEINT END)::UBIGINT AS h
          FROM sums s JOIN mn m USING (doc_id) GROUP BY s.doc_id)"""

  val all: Seq[Q] = Seq(

    // ---- metadata decode over binary payloads (mapPartitions path) --
    Q("m01_media_meta",
      (s, dir) =>
        Multimodal.decodeMeta(s, Multimodal.mediaFrame(Tables(s, dir, "documents")))
          .toDF().orderBy("doc_id"),
      // the stub's metadata is pure octet arithmetic → SQL-replayable
      Some("""WITH m AS (SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio'
               ELSE 'video' END AS media_type,
          encode(text) AS payload FROM documents)
        SELECT doc_id, media_type,
          CAST(octet_length(payload) AS BIGINT) AS n_bytes,
          CAST(octet_length(payload) % 1024 + 1 AS INT) AS width,
          CAST(octet_length(payload) % 768 + 1 AS INT) AS height,
          CAST(CASE WHEN media_type = 'audio' THEN 16000 ELSE 0 END AS INT) AS sample_rate,
          CAST(CASE WHEN media_type = 'video'
               THEN octet_length(payload) % 300 + 1 ELSE 1 END AS INT) AS n_frames
        FROM m ORDER BY doc_id NULLS FIRST""")),

    // ---- feature extraction (batched binary → float vector) ---------
    // The stub keeps byte-bucket sums in integer space with one final
    // f32 /255 (Multimodal.FakeDecoder), so DuckDB replays the vector
    // bit-exactly from the hex bytes: positional-bucket integer sums,
    // FLOAT division (IEEE round-to-nearest in both engines), exact
    // double summation of the 16 bucket values (24-bit mantissas over
    // a narrow exponent range — no rounding, so agg order is free).
    // The emitted value is floor(sum * 1e4) — an integer derived from
    // the identical double in both engines. (round(x, 4) is NOT
    // portable: Spark rounds HALF_UP on the double's exact decimal
    // expansion, DuckDB rounds via float arithmetic; they disagree on
    // 2.675-style edge values.)
    Q("m02_media_features",
      (s, dir) =>
        Multimodal.extractFeatures(
            s, Multimodal.mediaFrame(Tables(s, dir, "documents")))
          .toDF()
          .select(col("doc_id"),
            floor(aggregate(col("features"), lit(0.0),
              (acc, x) => acc + x) * 10000).as("feat_sum_e4"),
            size(col("features")).as("dim"))
          .orderBy("doc_id"),
      Some("""WITH m AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
          byt AS (SELECT doc_id, unnest(range(0, length(hx) // 2)) AS i, hx FROM m),
          bv AS (SELECT doc_id, i % 16 AS j,
              (strpos('0123456789ABCDEF', substr(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
              + (strpos('0123456789ABCDEF', substr(hx, CAST(2 * i + 2 AS INT), 1)) - 1) AS v
            FROM byt),
          sums AS (SELECT doc_id, j, sum(v) AS s FROM bv GROUP BY doc_id, j),
          fv AS (SELECT doc_id,
              CAST(CAST(s AS REAL) / CAST(255 AS REAL) AS DOUBLE) AS f FROM sums),
          agg AS (SELECT doc_id,
              CAST(floor(sum(f) * 10000) AS BIGINT) AS feat_sum_e4
            FROM fv GROUP BY doc_id)
        SELECT m.doc_id, coalesce(agg.feat_sum_e4, 0) AS feat_sum_e4,
          CAST(16 AS INT) AS dim
        FROM m LEFT JOIN agg USING (doc_id)
        ORDER BY m.doc_id NULLS FIRST""")),

    // ---- declarative frame sampling over video payloads -------------
    Q("m03_frame_sample",
      (s, dir) =>
        Multimodal.sampleFrames(
            Multimodal.mediaFrame(Tables(s, dir, "documents")))
          .orderBy("doc_id"),
      Some("""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS nb
          FROM documents WHERE doc_id % 3 = 2),
        f AS (SELECT doc_id, CAST(nb % 300 + 1 AS INT) AS n_frames FROM m)
        SELECT doc_id, n_frames,
          CAST((n_frames + 29) // 30 AS INT) AS n_sampled,
          CAST(((n_frames - 1) // 30) * 30 AS INT) AS last_frame
        FROM f ORDER BY doc_id NULLS FIRST""")),

    // ---- image near-dup via perceptual hash -------------------------
    // avg-hash each image payload, then Hamming-bucket candidate join
    // (shared operators/Dedup.hammingPairs machinery — never all-pairs).
    // The doubled frame plants exact payload duplicates (Hamming 0);
    // id shift is a multiple of 3 so media_type assignment is stable,
    // and lives at ~1e9 so planted ids never collide with real ids at
    // any supported SF.
    // The avg-hash is pure byte arithmetic, so DuckDB replays it: hex
    // the payload, parse byte values, positional-bucket sums, mean
    // threshold, then the shared Hamming-pairs tail.
    Q("m04_phash_neardup",
      (s, dir) => {
        val hashes = Multimodal.imageHashes(s,
          Multimodal.mediaFrame(doubledDocs(s, dir)))
        graft.operators.Dedup.hammingPairs(hashes, "doc_id", "phash", 6)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $phashCtes
        ${graft.operators.Dedup.sqlHammingTail(6)}""")),

    // ---- m06: image dedup clusters + keep-highest-resolution ---------
    // The media pipeline a real corpus runs after m04 finds the pairs:
    // connected components over the pHash matches (d05's star
    // machinery), then ONE SURVIVOR per visual cluster by the media
    // policy — keep the biggest payload (the highest-resolution /
    // least-recompressed copy), not the lowest id; ties (the planted
    // exact clones) break to the lowest id deterministically. Same
    // composition as d17 with a media-native score, proving the
    // survivor machinery is score-agnostic.
    Q("m06_image_dedup",
      (s, dir) => {
        val media = Multimodal.mediaFrame(doubledDocs(s, dir))
          .filter(col("media_type") === "image")
        val hashes = Multimodal.imageHashes(s, media)
        val pairs = graft.operators.Dedup
          .hammingPairs(hashes, "doc_id", "phash", 6)
        graft.operators.Dedup.clusterSurvivors(
            media.select(col("doc_id"), col("payload")), pairs,
            octet_length(col("payload")).cast("double"))
          .orderBy("component")
      },
      Some(s"""WITH RECURSIVE $phashCtes,
        prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.h, b.h)) <= 6
            AND (${(0 until 4).map(b =>
              s"((a.h >> ${b * 16}) & 65535) = ((b.h >> ${b * 16}) & 65535)")
              .mkString("\n              OR ")})),
        edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION ALL SELECT id_b, id_a FROM prs),
        univ AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM d2
          WHERE doc_id % 3 = 0),
        reach AS (
          SELECT doc_id AS id, doc_id AS label FROM univ
          UNION
          SELECT e.dst AS id, r.label AS label
          FROM reach r JOIN edges e ON r.id = e.src),
        comp AS (SELECT id AS doc_id, min(label) AS component
          FROM reach GROUP BY id),
        scored AS (SELECT u.doc_id, c.component, CAST(u.nb AS DOUBLE) AS q,
            count(*) OVER (PARTITION BY c.component) AS gs
          FROM univ u JOIN comp c ON u.doc_id = c.doc_id),
        rn AS (SELECT *, row_number() OVER (PARTITION BY component
            ORDER BY q DESC, doc_id) AS r FROM scored)
        SELECT component, doc_id, q AS quality,
          CAST(gs AS BIGINT) AS group_size
        FROM rn WHERE r = 1 ORDER BY component NULLS FIRST""")),

    // ---- m05: cross-modal retrieval (CLIP-shaped) --------------------
    // Top-k retrieval ACROSS modalities: queries from one embedding
    // modality, corpus restricted to the other (label parity plays the
    // modality tag — in a real pipeline these are the image and text
    // towers of a joint embedding space). Same scale shape as s01:
    // tiny query side broadcast, norms precomputed per side, f32-chain
    // cosine for bit-exact DuckDB replay, partition-local top-k so ≤ k
    // rows per (partition, qid) reach the exchange. No self-exclusion
    // predicate — the modality split already makes the sides disjoint.
    Q("m05_crossmodal_topk",
      (s, dir) => {
        import graft.functions.VectorFunctions._
        val Dim = 64; val K = 10
        val emb = Tables(s, dir, "embeddings")
          .withColumn("nrm", expr(chainNorm("embedding", Dim, 0)))
        val q = emb.filter(col("label") % 2 === 0 && col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("nrm").as("qn"))
        val corpus = emb.filter(col("label") % 2 === 1)
          .select(col("vec_id"), col("embedding").as("e"), col("nrm").as("en"))
        val scored = corpus.crossJoin(broadcast(q))
          .withColumn("cos",
            expr(s"CAST(${chainDot("qe", "e", Dim, 0)} AS DOUBLE)") /
              (col("qn") * col("en")))
        graft.operators.Similarity.topKPerQuery(scored, K)
          .orderBy("qid", "rank")
      },
      Some({
        import graft.functions.VectorFunctions._
        val Dim = 64; val K = 10
        s"""WITH n AS (SELECT vec_id, label, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
          FROM n WHERE label % 2 = 0 AND vec_id < 16),
        c AS (SELECT qid, vec_id,
            CAST(${chainDot("qe", "embedding", Dim, 1)} AS DOUBLE) / (qn * nrm) AS cos
          FROM n, q WHERE label % 2 = 1),
        r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
        SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $K
        ORDER BY qid NULLS FIRST, rank NULLS FIRST"""
      })),

    // ---- as-of join vs DuckDB's native ASOF JOIN --------------------
    Q("q17_asof_join",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts",
            Seq("ts", "value"))
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("p_ts"),
            col("asof_ts").cast("long").as("c_ts"),
            col("asof_value").as("c_value"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
          CAST(floor(epoch(p.ts)) AS BIGINT) AS p_ts,
          CAST(floor(epoch(c.ts)) AS BIGINT) AS c_ts,
          c.value AS c_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
              WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY event_id NULLS FIRST""")),
  )
}
