package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** One named, oracle-checkable query. `oracle` is equivalent DuckDB SQL
  * over the same parquet tables; None → driver records rows-only check. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational operator inventory (SURVEY.md §2.6): joins (broadcast /
  * shuffle / semi / anti), aggregations, rollup/cube/grouping sets,
  * window functions, set ops, sorts/top-k, scalar functions, subqueries.
  *
  * Determinism rules (SURVEY.md §7 risk 5) so DuckDB hash-compare is exact:
  *  - Sums of doubles go through a per-row DECIMAL cast (exact, order-
  *    independent addition) and the final value is cast back to DOUBLE.
  *    Both engines then produce bit-identical float64.
  *  - Every query ends with an ORDER BY forming a unique key; ASC orders
  *    say NULLS FIRST in the oracle (DuckDB defaults differ from Spark).
  *  - DuckDB type quirks are cast away in the oracle (sum(int)→HUGEINT,
  *    year()/length()→BIGINT, floor()→DOUBLE) to match Spark output types.
  */
object Relational {

  /** Order-independent exact sum of a double expression: per-row decimal
    * cast, exact decimal addition, result as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")
  private def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  val all: Seq[Q] = Seq(

    // ---- scan + filter + aggregate (TPC-H Q1 shape) ------------------
    Q("q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6).as("sum_charge"),
            (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
        ${sqlDsum("l_quantity")} / count(*) AS avg_qty,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- 5-way join, small dims broadcast (TPC-H Q5 shape) -----------
    Q("q02_revenue_by_nation",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val ord = Tables(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
        val li = Tables(s, dir, "lineitem")
        val nat = Tables(s, dir, "nation")
        val reg = Tables(s, dir, "region").filter($"r_name" === "ASIA")
        // lineitem⋈orders is the one big shuffle join; everything else is
        // broadcast so the plan stays a single shuffle at any scale.
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy($"n_name")
      },
      Some(s"""SELECT n_name,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
        count(*) AS n_items
        FROM lineitem, orders, customer, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n_name ORDER BY n_name NULLS FIRST""")),

    // ---- broadcast dim join -----------------------------------------
    Q("q03_brand_revenue",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem")
        val part = Tables(s, dir, "part").filter($"p_size" <= 25)
        li.join(broadcast(part), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"),
               dsum($"l_quantity").as("qty"),
               count(lit(1)).as("n_items"))
          .orderBy($"p_brand")
      },
      Some(s"""SELECT p_brand,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
        ${sqlDsum("l_quantity")} AS qty, count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 25
        GROUP BY p_brand ORDER BY p_brand NULLS FIRST""")),

    // ---- semi join (EXISTS) -----------------------------------------
    Q("q04_semi_join",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val urgent = Tables(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
        cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey NULLS FIRST""")),

    // ---- anti join (NOT EXISTS) -------------------------------------
    Q("q05_anti_join",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val ord = Tables(s, dir, "orders")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey NULLS FIRST""")),

    // ---- join + agg + global sort + limit (top-k) -------------------
    Q("q06_topk_customers",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val ord = Tables(s, dir, "orders")
        ord.groupBy($"o_custkey")
          .agg(dsum($"o_totalprice").as("spend"), count(lit(1)).as("n_orders"))
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .select($"c_custkey", $"c_name", $"spend", $"n_orders")
          .orderBy($"spend".desc, $"c_custkey")
          .limit(10)
      },
      Some(s"""SELECT c_custkey, c_name,
        ${sqlDsum("o_totalprice")} AS spend, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY spend DESC NULLS LAST, c_custkey NULLS FIRST LIMIT 10""")),

    // ---- window functions: row_number / rank / lag / running sum ----
    Q("q07_window_orders",
      (s, dir) => {
        import s.implicits._
        val ord = Tables(s, dir, "orders")
        val byDate = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        val byPrice = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        ord
          .withColumn("rn", row_number().over(byDate))
          .withColumn("price_rank", rank().over(byPrice))
          .withColumn("prev_price", lag($"o_totalprice", 1).over(byDate))
          .withColumn("running_spend",
            sum($"o_totalprice".cast(DecimalType(18, 2)))
              .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .select($"o_custkey", $"o_orderkey", $"rn", $"price_rank",
                  $"prev_price", $"running_spend")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(row_number() OVER wd AS INT) AS rn,
        CAST(rank() OVER wp AS INT) AS price_rank,
        lag(o_totalprice, 1) OVER wd AS prev_price,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (wd ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_spend
        FROM orders
        WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_custkey NULLS FIRST, rn NULLS FIRST""")),

    // ---- rollup ------------------------------------------------------
    Q("q08_rollup",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
          .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
      },
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
        ${sqlDsum("l_quantity")} AS qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- cube --------------------------------------------------------
    Q("q09_cube",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        ${sqlDsum("o_totalprice")} AS total
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // ---- set operations ---------------------------------------------
    Q("q10_setops",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val building = cust.filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
        val rich = cust.filter($"c_acctbal" > 5000.0).select($"c_custkey".as("k"))
        building.intersect(rich).withColumn("op", lit("both"))
          .unionByName(building.except(rich).withColumn("op", lit("building_only")))
          .unionByName(rich.except(building).withColumn("op", lit("rich_only")))
          .select($"op", $"k")
          .orderBy($"op", $"k")
      },
      Some("""WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
             r AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0)
        SELECT 'both' AS op, k FROM (SELECT k FROM b INTERSECT SELECT k FROM r)
        UNION ALL
        SELECT 'building_only' AS op, k FROM (SELECT k FROM b EXCEPT SELECT k FROM r)
        UNION ALL
        SELECT 'rich_only' AS op, k FROM (SELECT k FROM r EXCEPT SELECT k FROM b)
        ORDER BY op NULLS FIRST, k NULLS FIRST""")),

    // ---- distinct aggregates ----------------------------------------
    Q("q11_distinct",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_partkey").as("n_parts"),
            countDistinct($"l_suppkey").as("n_supps"),
            countDistinct($"l_orderkey").as("n_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
        count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps,
        count(DISTINCT l_orderkey) AS n_orders,
        count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag NULLS FIRST""")),

    // ---- grouping sets (SQL surface) --------------------------------
    Q("q12_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(s"""SELECT c_mktsegment, c_nationkey, count(*) AS n,
          CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
          FROM customer
          GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST""")
      },
      Some(s"""SELECT c_mktsegment, c_nationkey, count(*) AS n,
        ${sqlDsum("c_acctbal")} AS bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""")),

    // ---- scalar function coverage -----------------------------------
    Q("q13_scalar_funcs",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .filter($"o_orderkey" % 7 === 0)
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("yr"),
            month($"o_orderdate").as("mo"),
            dayofmonth($"o_orderdate").as("dom"),
            upper($"o_orderstatus").as("status_uc"),
            lower($"o_orderpriority").as("prio_lc"),
            substring($"o_orderpriority", 1, 1).as("prio_digit"),
            concat_ws("-", $"o_orderstatus", $"o_orderpriority").as("status_prio"),
            length($"o_orderpriority").as("prio_len"),
            regexp_replace($"o_orderpriority", "-", "_").as("prio_us"),
            floor($"o_totalprice").as("price_floor"),
            ceil($"o_totalprice").as("price_ceil"),
            when($"o_totalprice" > 200000.0, "big")
              .when($"o_totalprice" > 50000.0, "mid")
              .otherwise("small").as("bucket"),
            ($"o_totalprice" * 0.1).as("tenth"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        upper(o_orderstatus) AS status_uc,
        lower(o_orderpriority) AS prio_lc,
        substring(o_orderpriority, 1, 1) AS prio_digit,
        concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        CAST(length(o_orderpriority) AS INT) AS prio_len,
        regexp_replace(o_orderpriority, '-', '_', 'g') AS prio_us,
        CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        CASE WHEN o_totalprice > 200000.0 THEN 'big'
             WHEN o_totalprice > 50000.0 THEN 'mid'
             ELSE 'small' END AS bucket,
        o_totalprice * 0.1 AS tenth
        FROM orders WHERE o_orderkey % 7 = 0
        ORDER BY o_orderkey NULLS FIRST""")),

    // ---- group-by + having ------------------------------------------
    Q("q14_having",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("spend"))
          .filter($"n_orders" >= 12)
          .orderBy($"o_custkey")
      },
      Some(s"""SELECT o_custkey, count(*) AS n_orders,
        ${sqlDsum("o_totalprice")} AS spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        ORDER BY o_custkey NULLS FIRST""")),

    // ---- scalar subquery (orders above global mean price) -----------
    Q("q15_subquery_avg",
      (s, dir) => {
        import s.implicits._
        val ord = Tables(s, dir, "orders")
        // exact decimal mean → identical double in both engines
        val mean = ord.agg(
          (dsum($"o_totalprice") / count(lit(1))).as("mean_price"))
        ord.crossJoin(broadcast(mean))
          .filter($"o_totalprice" > $"mean_price")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT ${sqlDsum("o_totalprice")} / count(*) FROM orders)
        ORDER BY o_orderkey NULLS FIRST""")),

    // ---- approximate distinct (HLL) — PORTABLE, hash-exact ---------
    // The estimator is graft's own md5-based HLL (PortableHll): every
    // step evaluates bit-identically in Spark and DuckDB, so the
    // ESTIMATE itself is an oracle row — converting q16 from rows-only
    // to hash-exact (r10 ask #5). The built-in approx_count_distinct
    // remains covered by q26's driver-checked accuracy contract.
    Q("q16_approx_distinct",
      (s, dir) => {
        import graft.operators.PortableHll
        val li = Tables(s, dir, "lineitem")
        PortableHll.estimate(li, "l_partkey", "approx_parts")
          .crossJoin(broadcast(
            PortableHll.estimate(li, "l_orderkey", "approx_orders")))
          .crossJoin(broadcast(li.agg(count(lit(1)).as("n_rows"))))
      },
      Some(s"""WITH ${graft.operators.PortableHll.sqlCtes(
            "lineitem", "l_partkey", "p", "approx_parts")},
          ${graft.operators.PortableHll.sqlCtes(
            "lineitem", "l_orderkey", "o", "approx_orders")},
          n AS (SELECT count(*) AS n_rows FROM lineitem)
        SELECT approx_parts, approx_orders, n_rows FROM est_p, est_o, n""")),

    // ---- q36: CDC apply (MERGE INTO semantics) -----------------------
    // Snapshot maintenance for mutable upstreams: a synthetic change
    // log over `customer` exercises every MERGE branch — plain update
    // (%10=1, half of those updated TWICE so latest-wins is visible),
    // delete (%10=2), insert at +1e6 (%10=3), and insert-then-delete
    // in one batch (%10=4, must vanish). The log collapses via
    // max_by(payload, seq) — one partial-agg'd shuffle, no window —
    // and the snapshot never shuffles (broadcast anti-join gate).
    Q("q36_cdc_apply",
      (s, dir) => {
        import graft.operators.Cdc
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"))
        def ch(pred: Column, op: String, seq: Int, key: Column,
            name: Column, nat: Column, bal: Column) =
          cust.filter(pred).select(lit(op).as("op"),
            lit(seq).as("seq"), key.as("c_custkey"), name.as("c_name"),
            nat.as("c_nationkey"), bal.as("c_acctbal"))
        val k = col("c_custkey")
        val changes =
          ch(k % 10 === 1, "U", 1, k, col("c_name"), col("c_nationkey"),
              col("c_acctbal") + 100.0)
            .unionByName(ch(k % 20 === 1, "U", 2, k,
              concat(col("c_name"), lit("#v2")), col("c_nationkey"),
              col("c_acctbal") + 200.0))
            .unionByName(ch(k % 10 === 2, "D", 1, k,
              lit(null).cast("string"), lit(null).cast("int"),
              lit(null).cast("double")))
            .unionByName(ch(k % 10 === 3, "I", 1, k + 1000000L,
              concat(lit("new_"), col("c_name")), col("c_nationkey"),
              lit(0.0)))
            .unionByName(ch(k % 10 === 4, "I", 1, k + 2000000L,
              col("c_name"), col("c_nationkey"), col("c_acctbal")))
            .unionByName(ch(k % 10 === 4, "D", 2, k + 2000000L,
              lit(null).cast("string"), lit(null).cast("int"),
              lit(null).cast("double")))
        Cdc.applyChanges(cust, changes, Seq("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""WITH cust AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal
          FROM customer),
        ch AS (
          SELECT 'U' AS op, 1 AS seq, c_custkey, c_name, c_nationkey,
            c_acctbal + 100.0 AS c_acctbal FROM cust WHERE c_custkey % 10 = 1
          UNION ALL
          SELECT 'U', 2, c_custkey, c_name || '#v2', c_nationkey,
            c_acctbal + 200.0 FROM cust WHERE c_custkey % 20 = 1
          UNION ALL
          SELECT 'D', 1, c_custkey, NULL, NULL, NULL
          FROM cust WHERE c_custkey % 10 = 2
          UNION ALL
          SELECT 'I', 1, c_custkey + 1000000, 'new_' || c_name,
            c_nationkey, 0.0 FROM cust WHERE c_custkey % 10 = 3
          UNION ALL
          SELECT 'I', 1, c_custkey + 2000000, c_name, c_nationkey,
            c_acctbal FROM cust WHERE c_custkey % 10 = 4
          UNION ALL
          SELECT 'D', 2, c_custkey + 2000000, NULL, NULL, NULL
          FROM cust WHERE c_custkey % 10 = 4),
        lt AS (SELECT * FROM (SELECT ch.*, row_number() OVER (
              PARTITION BY c_custkey ORDER BY seq DESC) AS rn FROM ch)
          WHERE rn = 1)
        SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM cust
        WHERE c_custkey NOT IN (SELECT c_custkey FROM lt)
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM lt
        WHERE op <> 'D'
        ORDER BY c_custkey NULLS FIRST""")),
  )
}
