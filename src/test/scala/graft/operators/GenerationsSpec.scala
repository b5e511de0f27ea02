package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Crash-atomicity of the maintained-index swap protocol: a driver
  * death at ANY point of a compaction/rebuild must leave a COMPLETE
  * index live (never absent, never half-swapped), and probes must
  * return exactly what they returned before the crash. Crashes are
  * injected at both windows of [[Generations.commit]]:
  *
  *  - `before-flip`: the new generation is fully written but the
  *    pointer never moves → the OLD generation must keep serving.
  *  - `after-flip`: the pointer moved but the old generation was never
  *    GC'd → the NEW generation serves; the leftovers must be
  *    reclaimed by the next lifecycle operation, not leak forever.
  *
  * This is the failure drop-and-rename could not survive: between its
  * DROP and its RENAME there was no table at all. */
class GenerationsSpec extends SparkSpec {

  private def probeNd(name: String,
      batch: org.apache.spark.sql.DataFrame): Seq[Long] =
    Dedup.incrementalNearDupSurvivorsIndexed(spark, name, batch)
      .collect().map(_.getLong(0)).sorted.toSeq

  private def genTables(name: String): Seq[String] = {
    val c = spark.sessionState.catalog
    c.listTables(c.getCurrentDatabase, s"${name}_*").map(_.table)
      .filter(_.matches(".*_g\\d+$")).sorted
  }

  test("near-dup compaction: crash in either swap window never loses the index") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val name = "graft_gen_nd"
    Dedup.writeNearDupIndex(docs, name, numBuckets = 4)
    val batch = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(col("text"), lit(" zz pad")).as("text"))
      .unionByName(spark.range(1).select(lit(3000000000L).as("doc_id"),
        lit("wholly unrelated fresh text omega psi chi phi upsilon tau")
          .as("text")))
      .localCheckpoint()
    val before = probeNd(name, batch)
    assert(before.nonEmpty)
    val gen0 = Generations.currentGen(spark, name).get

    // -- crash BEFORE the flip: old generation stays live ------------
    Generations.failpoint = Some("before-flip")
    try intercept[IllegalStateException] {
      Dedup.compactNearDupIndex(spark, name)
    } finally Generations.failpoint = None
    assert(Generations.currentGen(spark, name).contains(gen0),
      "pointer moved despite the crash")
    // the index was never absent: it resolves and probes identically
    assert(probeNd(name, batch) == before,
      "probe diverged after a pre-flip crash")

    // -- recovery: the next compaction reclaims the debris and lands --
    Dedup.compactNearDupIndex(spark, name)
    val gen1 = Generations.currentGen(spark, name).get
    assert(gen1 > gen0)
    assert(probeNd(name, batch) == before,
      "probe diverged after the recovery compaction")
    // exactly one generation remains cataloged per member
    assert(genTables(name).size == 2, genTables(name).mkString(","))

    // -- crash AFTER the flip: new generation serves, debris is GC'd --
    Generations.failpoint = Some("after-flip")
    try intercept[IllegalStateException] {
      Dedup.compactNearDupIndex(spark, name)
    } finally Generations.failpoint = None
    val gen2 = Generations.currentGen(spark, name).get
    assert(gen2 > gen1, "pointer should have moved before the crash")
    assert(probeNd(name, batch) == before,
      "probe diverged after a post-flip crash")
    // the un-GC'd old generation is still cataloged (4 tables)...
    assert(genTables(name).size == 4, genTables(name).mkString(","))
    // ...until the next lifecycle op sweeps it
    Dedup.compactNearDupIndex(spark, name)
    assert(genTables(name).size == 2, genTables(name).mkString(","))
    assert(probeNd(name, batch) == before)
  }

  test("ANN compaction and retrain: crash in either window keeps probes identical") {
    val emb = Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val name = "graft_gen_ann"
    AnnIndex.writeAnnIndex(emb, name)
    def probe(): Set[(Long, Long, Int)] =
      AnnIndex.probeAnnIndex(spark, name, emb, col("vec_id") < 4, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = probe()
    assert(before.nonEmpty)
    val gen0 = Generations.currentGen(spark, name).get

    Generations.failpoint = Some("before-flip")
    try intercept[IllegalStateException] {
      AnnIndex.compactAnnIndex(spark, name)
    } finally Generations.failpoint = None
    assert(Generations.currentGen(spark, name).contains(gen0))
    assert(probe() == before, "probe diverged after a pre-flip crash")

    Generations.failpoint = Some("after-flip")
    try intercept[IllegalStateException] {
      AnnIndex.compactAnnIndex(spark, name)
    } finally Generations.failpoint = None
    assert(Generations.currentGen(spark, name).exists(_ > gen0))
    assert(probe() == before, "probe diverged after a post-flip crash")

    // a retrain over the same corpus is also a generation swap: same
    // deterministic training sample → same model → identical probes,
    // and cells+model move together behind one pointer
    AnnIndex.retrainAnnIndex(spark, name, emb)
    assert(probe() == before, "retrain over an unchanged corpus diverged")
    assert(genTables(name).size == 2, genTables(name).mkString(","))
  }

  test("rebuild over a live index is reader-safe: old generation intact until the flip") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 100)
    val name = "graft_gen_rebuild"
    Dedup.writeNearDupIndex(docs, name, numBuckets = 4)
    val gen0 = Generations.currentGen(spark, name).get
    // a rebuild that dies before its flip leaves the ORIGINAL build
    // fully live — the pre-generation writer dropped the old tables
    // before writing, so this exact crash used to lose the index
    Generations.failpoint = Some("before-flip")
    try intercept[IllegalStateException] {
      Dedup.writeNearDupIndex(docs, name, numBuckets = 4)
    } finally Generations.failpoint = None
    assert(Generations.currentGen(spark, name).contains(gen0))
    val batch = docs.select((col("doc_id") + 1000000000L).as("doc_id"),
      col("text"))
    // every batch doc is an exact replay of the intact index → all drop
    assert(probeNd(name, batch).isEmpty)
  }

  test("retention + as-of: a retained generation is a frozen pre-append snapshot") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    val name = "graft_gen_asof"
    Dedup.writeNearDupIndex(docs, name, numBuckets = 4)
    // the compaction publishes gen cur and RETAINS its predecessor
    Dedup.compactNearDupIndex(spark, name, gcKeep = 2)
    val cur = Generations.currentGen(spark, name).get
    val g0 = cur - 1
    assert(Generations.listGenerations(spark, name, "sigs") == Seq(g0, cur))
    // an exact copy of an indexed doc drops against BOTH snapshots
    val copy = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    assert(Dedup.incrementalNearDupSurvivorsIndexed(spark, name, copy)
      .isEmpty)
    assert(Dedup.incrementalNearDupSurvivorsIndexed(spark, name, copy,
      asOf = Some(g0)).isEmpty)
    // an in-place append touches ONLY the current generation: its docs
    // disqualify copies at the live probe but are invisible as-of g0 —
    // the frozen pre-append snapshot (the reproducibility contract)
    val fresh = spark.range(3)
      .select((col("id") + 2000000000L).as("doc_id"),
        concat(lit("asof wholly fresh doc "), col("id").cast("string"),
          lit(" nu xi omicron pi rho sigma tau upsilon")).as("text"))
      .localCheckpoint()
    Dedup.appendToNearDupIndex(fresh, name)
    val freshCopy = fresh
      .select((col("doc_id") + 500L).as("doc_id"), col("text"))
    assert(Dedup.incrementalNearDupSurvivorsIndexed(spark, name, freshCopy)
      .isEmpty)
    assert(Dedup.incrementalNearDupSurvivorsIndexed(spark, name, freshCopy,
        asOf = Some(g0))
      .collect().map(_.getLong(0)).toSet ==
      Set(2000000500L, 2000000501L, 2000000502L))
    // beyond-current generations don't exist yet
    intercept[IllegalArgumentException] {
      Generations.resolveAsOf(spark, name, "sigs", cur + 1)
    }
    // a default-gcKeep compaction narrows the window back to 1 and
    // the reclaimed generation answers with its retained neighbors
    Dedup.compactNearDupIndex(spark, name)
    assert(Generations.listGenerations(spark, name, "sigs").size == 1)
    val e = intercept[RuntimeException] {
      Generations.resolveAsOf(spark, name, "sigs", g0)
    }
    assert(e.getMessage.contains("reclaimed"), e.getMessage)
  }
}
