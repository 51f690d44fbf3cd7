package graft.sources

import graft.SparkSpec
import graft.operators.VersionedTable
import java.nio.file.Files

/** Connector-level guarantees of the graft-history DataSource V2
  * (the query-surface witness is pipe_table_history): short-name
  * registration, fixed schema, per-version partition planning,
  * zero-column pruning, and crashed-commit invisibility.
  */
class HistorySourceSpec extends SparkSpec {

  private def staged(): java.nio.file.Path = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_hist_spec_").resolve("t")
    VersionedTable.commitWithStats(spark, t, 0L,
      Seq(1L, 2L, 3L).toDF("id").repartition(1), "id")
    VersionedTable.commitWithStats(spark, t, 1L,
      Seq(10L).toDF("id").repartition(1), "id",
      carried = VersionedTable.manifest(t, 0L))
    VersionedTable.failedCommit(spark, t, 2L, Seq(99L).toDF("id"))
    t
  }

  test("short name resolves and the schema is the fixed history schema") {
    val t = staged()
    val df = spark.read.format("graft-history").load(t.toString)
    assert(df.schema == HistorySource.schema)
    assert(df.columns.toSeq == Seq("version", "file", "mn", "mx"))
  }

  test("one input partition per committed version; crash litter invisible") {
    val t = staged()
    val df = spark.read.format("graft-history").load(t.toString)
    assert(df.rdd.getNumPartitions == 2,
      "the scan must plan exactly one partition per committed version")
    val versions = df.select("version").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(versions == Seq(0L, 1L),
      "the crashed v2 must not surface in the history")
    // v1 carried v0's single line plus its own: 1 + 2 lines total.
    val counts = df.groupBy("version").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 1L, 1L -> 2L))
  }

  test("stats ride the manifest lines through carries") {
    val t = staged()
    val df = spark.read.format("graft-history").load(t.toString)
    val v1 = df.where("version = 1").select("mn", "mx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v1 == Set((1L, 3L), (10L, 10L)),
      "the carried v0 line must keep its original stats next to the " +
        "append's own")
  }

  test("column pruning reaches the reader (count(*) and narrow selects)") {
    val t = staged()
    val df = spark.read.format("graft-history").load(t.toString)
    assert(df.count() == 3)
    val narrow = df.select("version", "mn")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(!plan.contains("file#"),
      "the unused file column must be pruned out of the scan")
    assert(narrow.collect().length == 3)
  }

  test("a missing path fails loudly") {
    intercept[Exception] {
      spark.read.format("graft-history").load()
    }
  }
}
