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

  test("xml round-trip preserves nation (Spark 4 built-in XML source)") {
    // spark-xml graduated into Spark core in 4.0 — one more ingest
    // format (config exports, legacy feeds) with zero extra deps.
    // Schema passed at read: XML infers strings conservatively, and
    // ingest pipelines pin schemas anyway.
    val nation = Tables.nation(spark, sf001)
    val dir = tmp("xml")
    nation.write.mode("overwrite").format("xml")
      .option("rowTag", "nation").save(dir)
    val back = spark.read.format("xml")
      .option("rowTag", "nation").schema(nation.schema).load(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("zstd parquet round-trips (the cold-data codec choice is a config, not code)") {
    val part = Tables.part(spark, sf001)
    val dir = tmp("zstd")
    part.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".zstd.parquet"))
    assert(files.nonEmpty, "no zstd-suffixed parquet files written")
    assert(spark.read.parquet(dir).count() == part.count())
  }

  test("text source reads raw lines (one record per line ingestion)") {
    val docs = Tables.documents(spark, sf001).select("text")
    val dir = tmp("text")
    docs.write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    assert(back.count() == docs.count())
  }

  test("binaryFile source ingests opaque media blobs with path metadata") {
    // The multimodal ingestion path (SURVEY: image/audio/video as
    // opaque binary columns): raw files → (path, modificationTime,
    // length, content) rows, filterable by glob, no decode on read.
    val dir = tmp("binfiles")
    val payloads = Map("a.fakejpg" -> "fake-jpeg-bytes-0",
      "b.fakejpg" -> "fake-jpeg-bytes-001", "c.txt" -> "not-an-image")
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), bytes.getBytes("UTF-8"))
    }
    val imgs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.fakejpg").load(dir)
    assert(imgs.count() == 2, "glob filter did not select exactly the image files")
    val byName = imgs.collect().map { r =>
      val path = r.getAs[String]("path")
      path.substring(path.lastIndexOf('/') + 1) ->
        (r.getAs[Long]("length"), new String(r.getAs[Array[Byte]]("content"), "UTF-8"))
    }.toMap
    assert(byName("a.fakejpg") == (17L, "fake-jpeg-bytes-0"))
    assert(byName("b.fakejpg") == (19L, "fake-jpeg-bytes-001"))
  }

  test("dynamic partition overwrite replaces only the rewritten partition") {
    // The idempotent-backfill pattern: re-running one day/domain of a
    // 100 TB partitioned table must replace exactly that partition —
    // static overwrite mode would drop every sibling.
    val docs = Tables.documents(spark, sf001).select("doc_id", "lang", "n_chars")
    val dir = tmp("dynover")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val total = docs.count()
    val de = docs.filter(col("lang") === "de")
    val deSum = de.agg(sum("n_chars")).head.getLong(0)
    val deCount = de.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try de.withColumn("n_chars", col("n_chars") + lit(1))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(dir)
    assert(after.count() == total, "dynamic overwrite dropped sibling partitions")
    assert(after.filter(col("lang") === "de").agg(sum("n_chars")).head.getLong(0)
      == deSum + deCount, "rewritten partition does not hold the new rows")
  }

  test("maxRecordsPerFile splits one task's output (small-file control)") {
    // At scale, output file sizing is managed, not accidental: a single
    // task must be able to roll files at a bound instead of emitting
    // one giant file per partition.
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
    val n = docs.count()
    val dir = tmp("files")
    docs.coalesce(1).write.mode("overwrite")
      .option("maxRecordsPerFile", 100).parquet(dir)
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length >= (n / 100).toInt,
      s"expected >= ${n / 100} rolled files from one task, got ${files.length}")
    assert(spark.read.parquet(dir).count() == n)
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

  test("AvroIO round-trips the interchange subset, nulls and binary included") {
    import spark.implicits._
    val dir = tmp("avro")
    val data = Seq(
      (1L, 10, 1.5d, 2.5f, true, "a", Array[Byte](1, 2)),
      (2L, 20, -0.5d, 0f, false, "b", Array[Byte]()),
      (3L, 30, 0d, 1f, true, null.asInstanceOf[String], null.asInstanceOf[Array[Byte]]))
      .toDF("l", "i", "d", "f", "b", "s", "bin")
    val files = AvroIO.write(data.repartition(2), dir)
    assert(files == 2L, "one container file per non-empty partition")
    val back = AvroIO.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      data.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "the container header must reconstruct the Spark schema")
    val got = back.orderBy("l").collect()
    val want = data.orderBy("l").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      (0 until 6).foreach(c => assert(g.get(c) == w.get(c),
        s"column $c mismatch: ${g.get(c)} vs ${w.get(c)}"))
      val (gb, wb) = (g.getAs[Array[Byte]](6), w.getAs[Array[Byte]](6))
      assert((gb == null) == (wb == null) &&
        (gb == null || gb.sameElements(wb)), "binary column mismatch")
    }
    // Unsupported column types refuse loudly at schema time.
    intercept[IllegalArgumentException] {
      AvroIO.avroSchema(Seq((1L, Seq(1, 2))).toDF("id", "arr").schema)
    }
  }

  test("AvroIO: one big container splits on sync markers across tasks") {
    import spark.implicits._
    val dir = tmp("avro_split")
    // ONE container (single input partition) with enough rows to span
    // many Avro blocks — the pathological single-huge-file drop.
    val data = spark.range(0, 50000)
      .selectExpr("id", "repeat(CAST(id AS STRING), 20) AS pad")
      .coalesce(1)
    assert(AvroIO.write(data, dir) == 1L)
    // A small split target must yield SEVERAL input partitions over
    // the one file…
    val back = AvroIO.read(spark, dir, splitBytes = 64 * 1024L)
    assert(back.rdd.getNumPartitions > 1,
      s"expected >1 byte-range splits, got ${back.rdd.getNumPartitions}")
    // …and every record lands in exactly one split: identical rows,
    // no loss, no duplication.
    assert(back.count() == 50000L)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 50000L))
    // The default target reads the same rows through one split.
    assert(AvroIO.read(spark, dir).rdd.getNumPartitions == 1)
  }
}
