package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet fixtures (TESTDATA.md / FIXTURES.md).
  *
  * The reference has no sources at all — its input is a driver-resident
  * `std::vector` of pointer pairs (SURVEY.md §2.2 "Scans"). Here every
  * query reads columnar parquet so Catalyst can push filters and prune
  * columns down to the scan — the 100 TB posture.
  */
object Tables {

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` is INT64 epoch-*nanoseconds* (TIMESTAMP(NANOS)-annotated
    * parquet). Spark 4 refuses to read that as a timestamp — it must be
    * read as a long (`nanosAsLong`) and converted explicitly
    * (FIXTURES.md; verified failure mode). Conversion uses integer
    * division: a double intermediate at ~1.7e18 ns would lose
    * sub-microsecond precision.
    *
    * Adds `ts_utc` (timestamp from the nano ts) next to the raw columns.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set at construction by Verify/Bench/SparkSpec — see
    * [[GraftSession.configure]]); without it the parquet read fails with
    * PARQUET_TYPE_ILLEGAL. Deliberately NOT set here: toggling shared
    * session state inside a per-table reader changes behavior of every
    * subsequent parquet read (ADVICE r01).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      // ntz: written results then read back as naive timestamps (same as
      // the fixture date columns), keeping oracle comparisons tz-free.
      // Under the UTC session this is the UTC wall clock of the instant.
      .withColumn("ts_utc",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
}
