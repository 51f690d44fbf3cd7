package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Co-located joins via bucketing (SURVEY.md "minimize shuffles"):
  * both sides bucketed by the join key join WITHOUT an exchange — the
  * layout every repeated big-big join should be stored in at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange") {
    Tables.orders(spark, sf0001).write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, sf0001).write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    // Force the non-broadcast path so the bucketed layout is what
    // avoids the shuffle (broadcast would trivially avoid it).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          spark.table("orders_bkt")("o_custkey") === spark.table("customer_bkt")("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.orders(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
