package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY.md "skewed keys → salting or
  * AQE skew-join"): AQE's skew handling covers sort-merge joins after
  * the fact; explicit salting is the plan-level tool when one hot key
  * would otherwise pin a whole task.
  *
  * `saltedInnerJoin(big, small, key, S)` replicates every `small` row S
  * ways and spreads `big` rows across the S salts with a deterministic
  * hash of the whole row, then joins on `(key, salt)` — a hot key's
  * rows land in S tasks instead of one. The result is exactly the plain
  * inner join (salt only routes rows; every big row still meets every
  * matching small row exactly once).
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by saltedInnerJoin; rename the input column")
    val bigCols = big.columns
    // Deterministic routing: hash of the full row (vs rand(): keeps the
    // plan deterministic and re-executable, e.g. under task retries).
    // Note hash() rejects MapType columns at analysis; pre-project such
    // inputs to hashable columns.
    val salted = big.withColumn("__salt",
      pmod(hash(bigCols.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
