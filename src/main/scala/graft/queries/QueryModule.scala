package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named capability group of the engine. `SparkEntry` unions all
  * modules; every key in `queries` should appear in `oracles` unless the
  * operator is genuinely not expressible in ANSI SQL (approx sketches,
  * LSH candidates, ...), in which case the driver records a rows-only
  * check (SparkEntry contract).
  */
object QueryModule {
  /** Shared whitespace tokenizer (non-empty tokens). The SQL text must
    * stay byte-identical everywhere it appears — the dedup pipeline's
    * quality gate, the text module, and both oracles tokenize with the
    * same lambda, and a divergent copy would silently split their
    * semantics. */
  val Tokens = "filter(split(text, ' '), w -> w != '')"
  /** DuckDB rendering of [[Tokens]] for oracle SQL. */
  val DuckTokens = "list_filter(string_split(text, ' '), w -> w != '')"
}

trait QueryModule {
  /** name -> (spark, sfDir) -> result. Results must be deterministic:
    * small, fully sorted on a unique key, doubles derived via exact
    * decimal sums (SURVEY.md §7.4 oracle-parity notes). */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** name -> equivalent DuckDB SQL over views named like the parquet
    * tables, same ORDER BY, same column aliases. */
  def oracles: Map[String, String]
}
