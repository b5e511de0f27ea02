package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  lazy val toks = Tables(spark, sf, "documents")
    .select(explode(graft.functions.TextFunctions.tokens($"text")).as("k"))

  test("cms never under-estimates any key (fundamental guarantee)") {
    val (d, w) = (4, 256) // small w → collisions guaranteed at this SF
    val sk = CountMin.sketch(toks, "k", d, w)
    val exact = toks.groupBy("k").agg(count(lit(1)).as("ex"))
    val under = CountMin.estimate(sk, exact.select("k"), "k", d, w)
      .join(exact, "k")
      .filter($"cms_est" < $"ex")
      .count()
    assert(under == 0)
  }

  test("cms is exact when the table is wide enough to avoid collisions") {
    val keys = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(s"key$i"))
      .toDF("k")
    val (d, w) = (4, 65536) // 50 keys in 65536 buckets: collisions
    // would need two of 50 md5 prefixes to agree mod 65536 in ALL 4
    // rows — with min over rows, one clean row suffices for exactness
    val sk = CountMin.sketch(keys, "k", d, w)
    val exact = keys.groupBy("k").agg(count(lit(1)).as("ex"))
    val diff = CountMin.estimate(sk, exact.select("k"), "k", d, w)
      .join(exact, "k")
      .filter($"cms_est" =!= $"ex")
      .count()
    assert(diff == 0)
  }

  test("cms of a union equals elementwise sum of the parts' sketches") {
    val (d, w) = (4, 128)
    val docs = Tables(spark, sf, "documents")
    def half(p: Int) = docs.filter($"doc_id" % 2 === p)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("k"))
    val (a, b) = (half(0), half(1))
    val whole = CountMin.sketch(a.unionAll(b), "k", d, w)
    val merged = CountMin.sketch(a, "k", d, w)
      .unionAll(CountMin.sketch(b, "k", d, w))
      .groupBy("ri", "b").agg(sum($"c").as("c"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
  }

  test("estimate returns 0 for a key the corpus never saw, when its buckets are empty") {
    val keys = (1 to 5).map(i => s"only$i").toDF("k")
    val sk = CountMin.sketch(keys, "k", 4, 65536)
    val est = CountMin.estimate(sk, Seq("neverseen").toDF("k"), "k", 4, 65536)
      .collect().head.getLong(1)
    assert(est == 0L)
  }
}
