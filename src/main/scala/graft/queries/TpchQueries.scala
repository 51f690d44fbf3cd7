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
