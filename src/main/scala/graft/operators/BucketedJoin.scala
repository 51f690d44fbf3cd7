package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-located join via bucketing, as a driver-checkable operator (the
  * single most important 100 TB layout tool: two big tables that join
  * repeatedly on the same key are STORED pre-hashed into the same
  * bucket scheme, so every subsequent join reads bucket i against
  * bucket i with ZERO shuffle on either side — the exchange is paid
  * once at write time, then amortized over every query that joins on
  * the key).
  *
  * The query writes orders and customer bucketed by custkey (8 buckets,
  * sorted within buckets) into a caller-scoped temp warehouse, joins
  * them back MERGE-HINTED — the hint forces the sort-merge path
  * without touching the session's broadcast threshold, and the bucket
  * metadata then satisfies the join's distribution requirement so
  * EnsureRequirements inserts no Exchange (PlanShapeSpec asserts this
  * on the exact plan) — and aggregates per market segment.
  *
  * The split into write/plan/drop steps exists so the plan-shape spec
  * can inspect the live plan between table creation and drop; the
  * driver-facing query in RelationalQueries composes all three and
  * materializes the (tiny) aggregate before dropping the tables.
  */
object BucketedJoin {

  val OrdersTable = "graft_bkt_orders"
  val CustomerTable = "graft_bkt_customer"

  /** Write both join sides bucketed by the join key into `wh` (external
    * table paths — nothing lands in the session's default warehouse).
    * The repartition matches the bucket count so each bucket is one
    * file and the written sort order survives for the merge join. */
  def writeBucketed(s: SparkSession, dir: String, wh: String): Unit = {
    Tables.orders(s, dir)
      .repartition(8, col("o_custkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_bkt")
      .saveAsTable(OrdersTable)
    Tables.customer(s, dir)
      .repartition(8, col("c_custkey"))
      .write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_bkt")
      .saveAsTable(CustomerTable)
  }

  /** The co-located join over the catalog tables + a per-segment
    * rollup. The merge hint pins SortMergeJoin (broadcast would also
    * skip the shuffle, but trivially — the point is the bucketed
    * layout doing it for a BIG-big join); the aggregation above the
    * join shuffles on its own key as any rollup would. */
  def plan(s: SparkSession): DataFrame = {
    val o = s.table(OrdersTable)
    val c = s.table(CustomerTable)
    o.hint("merge")
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  def dropTables(s: SparkSession): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $OrdersTable")
    s.sql(s"DROP TABLE IF EXISTS $CustomerTable")
  }
}
