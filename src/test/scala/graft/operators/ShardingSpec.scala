package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardingSpec extends SparkSpec {

  import spark.implicits._

  // a packed stream: positions 0..5, token counts chosen so doc 2
  // spans the 10-token shard boundary and doc 4 covers a full shard
  private lazy val packed = Packing.packPlan(
    Seq((0L, 4L), (1L, 3L), (2L, 6L), (3L, 2L), (4L, 10L), (5L, 1L))
      .toDF("pos", "n_tokens"),
    "pos", "n_tokens", budget = 5)

  test("token overlaps tile the corpus exactly") {
    val assign = Sharding.shardAssignments(packed, tokensPerShard = 10L)
    // per-shard token counts sum to the corpus total…
    assert(assign.agg(sum("tok_in_shard")).as[Long].head() == 26L)
    // …and every shard except the last is full
    val perShard = Sharding.manifest(assign, "pos")
      .orderBy("shard").select("shard", "n_tokens").as[(Long, Long)].collect()
    assert(perShard.map(_._1).sameElements(Array(0L, 1L, 2L)))
    assert(perShard.dropRight(1).forall(_._2 == 10L))
    assert(perShard.last._2 == 6L)
  }

  test("a boundary-spanning doc appears in every shard it overlaps") {
    val assign = Sharding.shardAssignments(packed, tokensPerShard = 10L)
    // doc at pos 2 holds tokens [7, 13): 3 tokens in shard 0, 3 in 1
    val spans = assign.filter(col("pos") === 2L)
      .select("shard", "tok_in_shard").as[(Long, Long)].collect().sortBy(_._1)
    assert(spans.sameElements(Array((0L, 3L), (1L, 3L))))
  }

  test("a zero-token doc lands in exactly its start shard with 0 overlap") {
    val z = Seq((0L, 10L, 0L), (1L, 10L, 5L)).toDF("pos", "start_tok", "n_tokens")
    val assign = Sharding.shardAssignments(z, tokensPerShard = 10L)
    val row = assign.filter(col("pos") === 0L)
      .select("shard", "tok_in_shard").as[(Long, Long)].collect()
    assert(row.sameElements(Array((1L, 0L))))
  }

  test("writeShards lays out one file per shard and round-trips the rows") {
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_sharding_spec").getAbsolutePath
    val assign = Sharding.shardAssignments(packed, tokensPerShard = 10L)
    val back = Sharding.writeShards(assign, path)
    // round trip preserves the assignment set
    assert(back.count() == assign.count())
    assert(back.select("pos", "shard", "tok_in_shard").except(
      assign.select("pos", "shard", "tok_in_shard")).isEmpty)
    // one sequential file per shard directory — the streaming unit
    for (d <- new java.io.File(path).listFiles() if d.getName.startsWith("shard=")) {
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
  }

  test("appendShards seals old shards, rewrites only the boundary onward") {
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_sharding_append_spec").getAbsolutePath
    val all = Sharding.shardAssignments(packed, tokensPerShard = 10L)
    // batch A = positions 0..3 (tokens [0,15) — ends inside shard 1);
    // batch B = positions 4..5 with offsets continuing from A's total
    Sharding.writeShards(all.filter(col("pos") < 4L), path)
    def listing() = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    val before = listing()
    val back = Sharding.appendShards(all.filter(col("pos") >= 4L), path)
    val after = listing()
    // shard 0 is sealed: same file, same bytes, same mtime
    val sealedFiles = before.keys.filter(_.contains("shard=0"))
    assert(sealedFiles.nonEmpty)
    sealedFiles.foreach(p => assert(after(p) == before(p), s"sealed $p rewritten"))
    // the boundary shard (1) was rewritten; new shard dirs appeared
    assert(before.keys.exists(_.contains("shard=1")))
    assert(before.keys.filter(_.contains("shard=1"))
      .forall(p => !after.contains(p) || after(p) != before(p)))
    // the merged layout equals the one-shot layout row-for-row
    val oneShot = Sharding.manifest(all, "pos")
    val merged = Sharding.manifest(
      back.withColumn("shard", col("shard").cast("long")), "pos")
    assert(merged.except(oneShot).isEmpty && oneShot.except(merged).isEmpty)
  }

  test("deleteFromShards rewrites only affected shards, drops emptied ones") {
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_sharding_delete_spec").getAbsolutePath
    val all = Sharding.shardAssignments(packed, tokensPerShard = 10L)
    Sharding.writeShards(all, path)
    def listing() = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    val before = listing()
    // token spans: pos4=[15,25) (shards 1,2), pos5=[25,26) (shard 2) —
    // deleting both empties shard 2 and touches shard 1; shard 0
    // (pos 0,1,2) is unaffected
    val back = Sharding.deleteFromShards(spark, path,
      Seq(4L, 5L).toDF("pos"), idCol = "pos", schema = Some(all.schema))
    val after = listing()
    // survivors = the original assignment minus the deleted docs,
    // offsets untouched (holes remain)
    val expect = all.filter(!col("pos").isin(4L, 5L))
    assert(back.select("pos", "shard", "tok_in_shard", "start_tok").except(
      expect.select("pos", "shard", "tok_in_shard", "start_tok")).isEmpty)
    assert(back.count() == expect.count())
    // shard 2 held only deleted docs → the directory is gone
    assert(!after.keys.exists(_.contains("shard=2")),
      "fully-emptied shard directory not dropped")
    // the unaffected shard 0 is byte-identical (same file/bytes/mtime)
    val sealedFiles = before.keys.filter(_.contains("shard=0"))
    assert(sealedFiles.nonEmpty)
    sealedFiles.foreach(p =>
      assert(after(p) == before(p), s"unaffected $p rewritten"))
    // replay of the same deletion converges to the same layout
    val again = Sharding.deleteFromShards(spark, path,
      Seq(4L, 5L).toDF("pos"), idCol = "pos", schema = Some(all.schema))
    assert(again.count() == expect.count())
  }

  test("deleteFromShards leaves untouched shard files byte-identical") {
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_sharding_delete_seal_spec").getAbsolutePath
    // 12 one-token docs over 3-token shards → shards 0..3, doc→shard
    // is pos/3; deleting pos 7 touches only shard 2
    val wide = Sharding.shardAssignments(
      Packing.packPlan((0L to 11L).map((_, 1L)).toDF("pos", "n_tokens"),
        "pos", "n_tokens", budget = 3), tokensPerShard = 3L)
    Sharding.writeShards(wide, path)
    def listing() = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    val before = listing()
    val back = Sharding.deleteFromShards(spark, path, Seq(7L).toDF("pos"),
      idCol = "pos", schema = Some(wide.schema))
    val after = listing()
    val untouched = before.keys.filterNot(_.contains("shard=2"))
    assert(untouched.nonEmpty)
    untouched.foreach(p =>
      assert(after(p) == before(p), s"unaffected $p rewritten"))
    assert(back.filter(col("pos") === 7L).isEmpty)
    assert(back.count() == 11L)
    // deleting ids absent from the layout is a no-op
    val noop = Sharding.deleteFromShards(spark, path, Seq(99L).toDF("pos"),
      idCol = "pos", schema = Some(wide.schema))
    assert(noop.count() == 11L)
  }

  test("empty corpus and never-written layouts degrade cleanly") {
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_sharding_empty_spec").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))
    val all = Sharding.shardAssignments(packed, tokensPerShard = 10L)
    val none = all.filter(col("pos") < 0L)
    import spark.implicits._
    // deletion from a never-written layout: clean empty no-op with the
    // layout's column order, not a read of the missing path (a
    // first-ever delete-only CDC night reaches here)
    val missing = Sharding.deleteFromShards(spark, path,
      Seq(1L).toDF("doc_id"), schema = Some(all.schema))
    assert(missing.isEmpty)
    assert(missing.columns.last == "shard",
      "empty-layout frame must match readLayout's shard-last order")
    // empty write: no files, no failed read-back, empty frame out
    assert(Sharding.writeShards(none, path).isEmpty)
    // append to a never-written layout = the initial write
    val back = Sharding.appendShards(all, path)
    assert(back.count() == all.count())
    // empty append onto a real layout is a no-op returning the layout
    assert(Sharding.appendShards(none, path).count() == all.count())
  }

  test("tiling and contiguity hold for arbitrary corpora (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default.withSize(40)
    val countsGen = Gen.nonEmptyListOf(Gen.choose(0L, 23L))
    for (trial <- 0 until 5) {
      val counts = countsGen.pureApply(params, Seed(900L + trial))
        .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      val s = 1L + trial * 3L // shard sizes 1, 4, 7, 10, 13
      val assign = Sharding.shardAssignments(
        Packing.packPlan(counts.toDF("pos", "n_tokens"),
          "pos", "n_tokens", budget = 5), tokensPerShard = s)
      val m = Sharding.manifest(assign, "pos").orderBy("shard")
        .select("shard", "n_tokens").as[(Long, Long)].collect()
      val total = counts.map(_._2).sum
      // tiling: per-shard tokens sum to the corpus total
      assert(m.map(_._2).sum == total, s"trial $trial s=$s")
      // contiguity: shards are exactly 0..ceil(total/s)-1, every
      // non-final shard full (zero-token docs can pad past the end)
      if (total > 0) {
        val nShards = (total + s - 1) / s
        assert(m.map(_._1).filter(_ < nShards)
          .sameElements(0L until nShards), s"trial $trial s=$s")
        m.filter(t => t._1 < nShards - 1).foreach { case (sh, tok) =>
          assert(tok == s, s"trial $trial s=$s shard $sh not full: $tok")
        }
      }
    }
  }
}
