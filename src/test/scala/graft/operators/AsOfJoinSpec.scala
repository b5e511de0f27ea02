package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of attaches the latest right row at or before left ts") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:30")),
      (3L, "B", ts("2024-01-01 10:00:10"))
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:20"), 101.0),
      ("B", ts("2024-01-01 10:00:10"), 50.0), // same instant as trade 3
      ("B", ts("2024-01-01 10:00:15"), 51.0)
    ).toDF("sym", "t", "px")
    val out = AsOfJoin.backward(trades, quotes, "sym", "t", "t", Seq("px"))
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(100.0)) // latest quote <= 10:00:05
    assert(out(2L) == Some(101.0)) // 10:00:20 quote wins over 10:00:00
    assert(out(3L) == Some(50.0))  // inclusive: same-instant quote attaches
  }

  test("left rows with no prior right row get null") {
    val l = Seq((1L, "X", ts("2024-01-01 09:00:00"))).toDF("id", "k", "t")
    val r = Seq(("X", ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "t", "v")
    val out = AsOfJoin.backward(l, r, "k", "t", "t", Seq("v")).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("asof_v")))
  }

  test("a matched right row's NULL field stays NULL (no field mixing)") {
    // round-1 ADVICE: per-column last(ignoreNulls) windows would pull
    // px from the 10:00:00 row but qty from the newer 10:00:20 row;
    // ASOF semantics return the matched row wholesale, NULLs included
    val trades = Seq((1L, "A", ts("2024-01-01 10:00:30"))).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(100.0), Some(5L)),
      ("A", ts("2024-01-01 10:00:20"), None, Some(7L)) // matched row: px NULL
    ).toDF("sym", "t", "px", "qty")
    val out = AsOfJoin.backward(trades, quotes, "sym", "t", "t", Seq("px", "qty"))
      .select("asof_px", "asof_qty").head()
    assert(out.isNullAt(0), "px must be the matched row's NULL, not 100.0")
    assert(out.getLong(1) == 7L)
  }

  test("matches a naive per-row scan on random data incl. NULLs and ties (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default.withSize(50)
    // small key/time domains force ties and empty-match cases
    val leftGen = Gen.listOf(for {
      k <- Gen.choose(0, 2); t <- Gen.choose(0L, 20L)
    } yield (k, t)).map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })
    val rightGen = Gen.listOf(for {
      k <- Gen.choose(0, 2); t <- Gen.choose(0L, 20L)
      v <- Gen.option(Gen.choose(0.0, 9.0))
    } yield (k, t, v))
    for (trial <- 0 until 5) {
      val ls = leftGen.pureApply(params, Seed(700L + trial))
      val rs = rightGen.pureApply(params, Seed(800L + trial))
        .zipWithIndex.map { case ((k, t, v), i) => (k, t, v, i.toLong) }
      val l = ls.toDF("id", "k", "t")
      val r = rs.toDF("k", "t", "v", "rid")
      // rid first in the struct → ties broken by rid (unique), so the
      // naive oracle below is exact
      val got = AsOfJoin.backward(l, r, "k", "t", "t", Seq("rid", "v"))
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
      // naive: matched row = max (t, rid) among right rows with t <= lt
      val expected = ls.map { case (id, k, lt) =>
        val cands = rs.filter(x => x._1 == k && x._2 <= lt)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(x => (x._2, x._4))._4))
      }.toMap
      assert(got == expected, s"trial=$trial")
    }
  }

  test("plan shuffles once on the key, not a range-join explosion") {
    val l = Seq((1L, "X", ts("2024-01-01 09:00:00"))).toDF("id", "k", "t")
    val r = Seq(("X", ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "t", "v")
    val plan = AsOfJoin.backward(l, r, "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }
}
