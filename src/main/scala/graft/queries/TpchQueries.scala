package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H query shapes (Q3/Q5/Q10/Q18) adapted to the fixture
  * schema — multi-join plans where Catalyst's join ordering, broadcast
  * selection and partial aggregation carry the 100 TB story. Revenue
  * follows the module-wide decimal policy (exact sum, round to scale 2,
  * then double).
  */
object TpchQueries extends QueryModule {

  private def revenue(ext: Column, disc: Column): Column =
    QueryModule.revenue(ext, disc)

  private val duckRevenue = QueryModule.DuckRevenue

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q3 shape: shipping-priority — segment filter on the dim, date
    // split between orders and lineitem, top-10 revenue orders.
    "tpch_q3" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir).where($"c_mktsegment" === "BUILDING")
        .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey")
        .where($"o_orderdate" < lit("1998-01-01").cast("timestamp_ntz"))
        .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
        .where($"l_shipdate" > lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(revenue($"l_extendedprice", $"l_discount").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // Q5 shape: local-supplier volume in ASIA for one year — the 6-way
    // join with the extra c_nationkey = s_nationkey co-location filter.
    "tpch_q5" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey")
        .where(year($"o_orderdate") === 1996)
        .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
        .join(Tables.supplier(s, dir),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .where($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(revenue($"l_extendedprice", $"l_discount").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // Q10 shape: revenue lost to returned items, top 20 customers.
    "tpch_q10" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey")
        .where(year($"o_orderdate") === 1997)
        .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
        .where($"l_returnflag" === "R")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(revenue($"l_extendedprice", $"l_discount").as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    // Q4 shape: order-priority checking — EXISTS correlated subquery
    // lowering to a left-semi join (fixture has no l_commitdate/
    // l_receiptdate, so the "late line" predicate is adapted to
    // l_shipdate > o_orderdate; the semi-join shape is the point).
    "tpch_q4" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
        .where($"o_orderdate".between(
          lit("1997-01-01").cast("timestamp_ntz"),
          lit("1997-12-31").cast("timestamp_ntz")))
      val lateLines = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_shipdate")
      o.join(lateLines,
          $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate",
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q14 shape: promotion revenue share — conditional aggregation over
    // a fact⋈dim join, one ratio row out. Ratio in ppm via the decimal
    // revenue pair (engine-exact integers, no float division drift).
    "tpch_q14" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .where(year($"l_shipdate") === 1997)
        .join(Tables.part(s, dir), $"l_partkey" === $"p_partkey")
        .agg(
          revenue($"l_extendedprice", $"l_discount").as("total_revenue"),
          revenue(
            when($"p_type" === "PROMO", $"l_extendedprice").otherwise(lit(0.0)),
            $"l_discount").as("promo_revenue"))
        // nullif: an empty year would make total_revenue 0.0, the double
        // division Infinity, and CAST(inf AS BIGINT) throws under ANSI —
        // degrade to NULL instead (mirrored in the oracle).
        .selectExpr("promo_revenue", "total_revenue",
          "CAST(floor(promo_revenue * 1000000 / nullif(total_revenue, 0.0D)) AS BIGINT) AS promo_ppm")
    }),

    // Q21 shape: suppliers-who-kept-orders-waiting — the EXISTS +
    // NOT EXISTS double self-join on the fact table (semi-join then
    // anti-join on the same key), the hardest join-planning shape in
    // TPC-H. Adapted semantics on fixture columns: a supplier's 'R'
    // line on a multi-supplier order where NO other supplier's line on
    // that order is 'R'.
    "tpch_q21" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      val l1 = li.where($"l_returnflag" === "R")
      val withOther = l1.as("l1").join(li.as("l2"),
        $"l1.l_orderkey" === $"l2.l_orderkey" &&
          $"l1.l_suppkey" =!= $"l2.l_suppkey",
        "left_semi")
      val soleFault = withOther.as("l1").join(
        li.where($"l_returnflag" === "R").as("l3"),
        $"l1.l_orderkey" === $"l3.l_orderkey" &&
          $"l1.l_suppkey" =!= $"l3.l_suppkey",
        "left_anti")
      soleFault
        .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"s_name", $"n_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(25)
    }),

    // Q18 shape: large-volume orders (whole-group predicate feeding a
    // join — the aggregate-then-join pattern).
    "tpch_q18" -> ((s, dir) => {
      import s.implicits._
      val big = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast("decimal(12,2)")).cast("double").as("sum_qty"))
        .where($"sum_qty" > 300)
      Tables.orders(s, dir)
        .join(big, $"o_orderkey" === $"l_orderkey")
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"sum_qty")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    })
  )

  override def oracles: Map[String, String] = Map(
    "tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $duckRevenue AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "tpch_q5" ->
      s"""SELECT n_name, $duckRevenue AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name, $duckRevenue AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE year(o_orderdate) = 1997 AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "tpch_q14" ->
      s"""WITH j AS (
         |  SELECT l_extendedprice, l_discount, p_type
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE year(l_shipdate) = 1997),
         |r AS (
         |  SELECT $duckRevenue AS total_revenue,
         |    CAST(CAST(round(sum(
         |      CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0 END AS DECIMAL(12,2))
         |      * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS promo_revenue
         |  FROM j)
         |SELECT promo_revenue, total_revenue,
         |  CAST(floor(promo_revenue * 1000000 / nullif(total_revenue, 0.0)) AS BIGINT) AS promo_ppm
         |FROM r""".stripMargin,
    "tpch_q21" ->
      """WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        |f AS (SELECT * FROM l1
        |      WHERE EXISTS (SELECT 1 FROM lineitem l2
        |                    WHERE l2.l_orderkey = l1.l_orderkey
        |                      AND l2.l_suppkey <> l1.l_suppkey)
        |        AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                        WHERE l3.l_orderkey = l1.l_orderkey
        |                          AND l3.l_suppkey <> l1.l_suppkey
        |                          AND l3.l_returnflag = 'R'))
        |SELECT s_name, n_name, count(*) AS numwait
        |FROM f
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,
    "tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin
  )
}
