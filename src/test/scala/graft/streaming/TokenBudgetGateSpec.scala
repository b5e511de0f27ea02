package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sampling

/** The streaming token-budget gate's contract: epoch-order admission
  * with q30's md5 rank inside each epoch, budget state carried across
  * micro-batches — and exact q30 equality when the whole input lands
  * in one micro-batch (which also proves the JVM md5 rank matches the
  * SQL spelling bit-for-bit). */
class TokenBudgetGateSpec extends SparkSpec {

  private val RocksKey = "spark.sql.streaming.stateStore.providerClass"
  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(RocksKey, v)
      case None => spark.conf.unset(RocksKey)
    }
  }

  private val Budget = 100L
  private val Salt = "tbg1"

  /** The reference fold: per batch, sort each stratum's rows by the
    * gate's own rank and run the q30 prefix rule with carried state. */
  private def referenceFold(batches: Seq[Seq[BudgetDoc]]): Set[(String, Long, Long)] = {
    val seen = scala.collection.mutable.Map.empty[String, Long]
    val out = scala.collection.mutable.Set.empty[(String, Long, Long)]
    batches.foreach { b =>
      b.groupBy(_.stratum).foreach { case (s, docs) =>
        var run = seen.getOrElse(s, 0L)
        docs.sortBy(d => (TokenBudgetGate.md5Rank(d.doc_id, Salt), d.doc_id))
          .foreach { d =>
            run += d.n_tokens
            if (run <= Budget) out += ((s, d.doc_id, run))
          }
        seen(s) = run
      }
    }
    out.toSet
  }

  private def runStream(batches: Seq[Seq[BudgetDoc]]): Set[(String, Long, Long)] =
    withRocks {
      import spark.implicits._
      val mem = MemoryStream[BudgetDoc](spark)
      val name = s"tbg_out_${System.nanoTime()}"
      val q = TokenBudgetGate.gate(spark, mem.toDS(), Budget, Salt)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      } finally q.stop()
    }

  private def docs(s: String, ids: Range, tok: Long): Seq[BudgetDoc] =
    ids.map(i => BudgetDoc(s, i.toLong, tok))

  test("multi-batch stream == sequential epoch fold with carried budget") {
    val batches = Seq(
      docs("web", 0 until 8, 9L) ++ docs("code", 100 until 103, 30L),
      docs("web", 8 until 16, 9L) ++ docs("code", 103 until 106, 30L),
      docs("web", 16 until 24, 9L) ++ docs("code", 106 until 109, 30L))
    val got = runStream(batches)
    val ref = referenceFold(batches)
    assert(got == ref, s"stream=$got\nref=$ref")
    // budget semantics really bit: web admits 11 of 24 (99 ≤ 100 < 108),
    // code admits 3 of 9 (90 ≤ 100 < 120), and batch-3 web admits none
    assert(got.count(_._1 == "web") == 11, got.toString)
    assert(got.count(_._1 == "code") == 3, got.toString)
    assert(got.collect { case ("web", id, _) => id }.max < 16)
  }

  test("single-batch stream == batch q30 (JVM and SQL md5 ranks agree)") {
    import spark.implicits._
    // heterogeneous token counts so the rank order decides the set
    val all = (0 until 40).map(i =>
      BudgetDoc(if (i % 2 == 0) "a" else "b", i.toLong, (i % 7 + 3).toLong))
    val got = runStream(Seq(all))
    val static = all.toDF()
    val batch = Sampling.tokenBudgetSample(static, col("doc_id"),
        col("stratum"), col("n_tokens"), Budget, Salt)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    assert(got == batch, s"stream=$got\nbatch=$batch")
    assert(got.nonEmpty && got.size < all.size) // both branches exercised
  }

  test("an exhausted stratum stays closed in later batches") {
    val batches = Seq(
      Seq(BudgetDoc("x", 1L, 100L)), // exactly consumes the budget
      Seq(BudgetDoc("x", 2L, 1L)),   // would fit under first-fit — must NOT
      Seq(BudgetDoc("y", 3L, 5L)))   // other strata unaffected
    val got = runStream(batches)
    assert(got == Set(("x", 1L, 100L), ("y", 3L, 5L)), got.toString)
  }
}
