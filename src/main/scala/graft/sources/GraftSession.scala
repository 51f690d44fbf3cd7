package graft.sources

import org.apache.spark.sql.SparkSession

/** Session config shared by every entry point (Verify, Bench, tests).
  *
  * Central so that fixture-driven settings are visible at construction
  * time instead of mutated mid-session by readers (ADVICE r01):
  *
  *  - `nanosAsLong`: `events.ts` is INT64 TIMESTAMP(NANOS) parquet,
  *    which Spark 4 refuses to read as a timestamp (FIXTURES.md).
  *  - UTC session timezone: oracle parity (DuckDB runs in UTC).
  *  - [[graft.functions.GraftExtensions]]: registers the engine's native
  *    Catalyst functions (e.g. `cosine_sim`).
  */
object GraftSession {
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
}
