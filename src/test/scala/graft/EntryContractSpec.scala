package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the SparkEntry ↔ driver contract shape itself: every oracle
  * must target an existing query (a typo'd key silently vanishes from
  * the driver's compare), and the set of queries WITHOUT an oracle —
  * which the driver only rows-checks — must stay exactly the declared
  * sketch/LSH set, so an accidentally dropped oracle can't silently
  * demote a query from hash-checked to rows-only.
  */
class EntryContractSpec extends AnyFunSuite {

  private val RowsOnly = Set(
    "dedup_minhash_lsh", "dedup_simhash",
    "emb_ann_topk", "emb_ivf_topk", "emb_pq_topk",
    "rel_approx_distinct", "rel_approx_quantiles",
    "txt_heavy_hitters")

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("the rows-only set is exactly the declared sketch queries") {
    val actual = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(actual == RowsOnly,
      s"unexpected rows-only queries (oracle dropped?): ${actual.diff(RowsOnly)}; " +
        s"stale declarations: ${RowsOnly.diff(actual)}")
  }

  test("no duplicate query names across modules") {
    // Map construction silently keeps the last binding on a key clash;
    // compare against the per-module sum to catch a shadowed query.
    val perModule = SparkEntry.modules.map(_.queries.size).sum
    assert(SparkEntry.queries.size == perModule,
      "two modules define the same query name")
  }
}
