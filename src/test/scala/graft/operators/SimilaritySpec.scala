package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables(spark, sf, "embeddings")

  test("cosine_sim expression matches a reference Scala computation") {
    VectorFunctions.register(spark)
    val rows = emb.limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val got = emb.as("a").limit(50)
      .crossJoin(emb.as("b").limit(50))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        expr("cosine_sim(a.embedding, b.embedding)").as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def ref(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      (0 until math.min(x.length, y.length)).foreach { i =>
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i)
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    for ((ia, va) <- rows.take(5); (ib, vb) <- rows.take(5)) {
      assert(math.abs(got((ia, ib)) - ref(va, vb)) < 1e-12)
    }
  }

  test("cosine_sim participates in whole-stage codegen") {
    VectorFunctions.register(spark)
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; a codegen-incapable expression would force a fallback
    // Project without it
    val plan = emb.select(expr("cosine_sim(embedding, embedding)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("LSH top-k has decent recall vs brute force") {
    val bf = Similarity.bruteForceTopK(spark, emb, col("vec_id") < 8, 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, emb, col("vec_id") < 8, 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // random hyperplanes on near-random vectors: just require nonempty
    // overlap and sane shape (recall asserted loosely; tightened when
    // the corpus has real clusters)
    assert(lsh.nonEmpty)
    assert((bf & lsh).nonEmpty)
  }

  test("IVF top-k returns k deterministic neighbors per query") {
    val a = Similarity.ivfTopK(spark, emb, col("vec_id") < 8, 5).collect()
    val b = Similarity.ivfTopK(spark, emb, col("vec_id") < 8, 5).collect()
    assert(a.toSeq == b.toSeq) // deterministic across runs
    assert(a.groupBy(_.getLong(0)).forall(_._2.length == 5))
  }
}
