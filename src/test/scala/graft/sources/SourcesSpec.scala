package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink coverage beyond the fixture parquet (SURVEY.md §2.2
  * "Scans/sources/sinks"): csv and json round-trips, and a
  * partitioned-by-column sink whose partition values prune at read. */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft-$name").toString

  test("csv round-trip preserves nation exactly (header + inferSchema)") {
    val nation = Tables.nation(spark, sf001)
    val dir = tmp("csv")
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round-trip preserves region (schema given at read)") {
    val region = Tables.region(spark, sf001)
    val dir = tmp("json")
    region.write.mode("overwrite").json(dir)
    val back = spark.read.schema(region.schema).json(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trip preserves supplier exactly (native columnar alt)") {
    val supplier = Tables.supplier(spark, sf001)
    val dir = tmp("orc")
    supplier.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == supplier.schema)
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      supplier.orderBy("s_suppkey").collect().toSeq)
    // ORC scans support predicate pushdown like parquet — keep it
    // visible so a format switch doesn't silently lose the pushdown.
    val p = back.filter(col("s_suppkey") === 1L).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(s_suppkey)"),
      s"orc scan lost filter pushdown:\n$p")
  }

  test("partitioned parquet sink prunes partitions at read") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "lang", "n_chars")
    val dir = tmp("part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "de")
    val expected = docs.filter(col("lang") === "de").count()
    assert(back.count() == expected)
    // Partition pruning: the 'de' filter must reach partition metadata,
    // not data — visible as a partition filter count in the scan node.
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter missing from scan:\n$scan")
  }
}
