package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.HeavyHitters.HeavyHittersAgg

/** The Misra–Gries guarantees, pinned across partitionings: the
  * GUARANTEES are partitioning-invariant even though the surviving
  * counter values are not — which is exactly what q31's contract rows
  * rely on. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 400×a + 260×b + 340 singleton tail = n 1000; k=4 → heavy iff
  // freq > 250: exactly {a, b}, with a fat tail pressuring the counters
  private val data =
    Seq.fill(400)("a") ++ Seq.fill(260)("b") ++ (1 to 340).map(i => s"t$i")
  private val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("heavy keys survive and counts lower-bound within n/k, any partitioning") {
    val n = data.size
    for (p <- Seq(1, 3, 8)) {
      val out = data.toDF("key").repartition(p)
        .agg(HeavyHittersSpec.mg4(col("key")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.key"), col("e.cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= 4, s"p=$p: ${out.size} counters for k=4")
      assert(out.contains("a") && out.contains("b"),
        s"p=$p: heavy keys lost: $out")
      out.foreach { case (k, c) =>
        assert(c <= exact(k), s"p=$p: $k over-counted: $c > ${exact(k)}")
        assert(exact(k) - c <= n / 4,
          s"p=$p: $k under-counted past n/k: $c vs ${exact(k)}")
      }
    }
  }

  test("degenerate cases: uniform input stays bounded; k=1 still lower-bounds") {
    val uni = (1 to 100).map(i => s"u$i").toDF("key")
    val out = uni.agg(HeavyHittersSpec.mg4(col("key")).as("hh"))
      .select(size(col("hh"))).first().getInt(0)
    assert(out <= 4) // no heavy keys exist; nothing to guarantee but the bound
    val one = data.toDF("key")
      .agg(HeavyHittersSpec.mg1(col("key")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.key"), col("e.cnt")).collect()
    one.foreach { r => assert(r.getLong(1) <= exact(r.getString(0))) }
  }
}

object HeavyHittersSpec {
  // bind the UDF first: udaf(agg)(col) would feed the column to the
  // implicit TypeTag parameter list
  val mg4 = udaf(new HeavyHittersAgg(4))
  val mg1 = udaf(new HeavyHittersAgg(1))
}
