package graft.queries

import graft.SparkSpec

/** Physical-plan regression guards: correctness gates don't catch a
  * query that silently stops pushing filters or broadcasting dims —
  * these do. (SURVEY.md: "iterate until it's the plan you'd want".) */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf001)
      .queryExecution.executedPlan.toString

  test("filter+project reaches the parquet scan (pushdown + pruning)") {
    val p = plan("rel_filter_topn")
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters in scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double"),
      "scan reads more columns than the projection needs")
  }

  test("global top-k avoids a full sort (TakeOrderedAndProject)") {
    assert(plan("rel_topk").contains("TakeOrderedAndProject"))
  }

  test("star join broadcasts the dimension side") {
    assert(plan("rel_join_revenue").contains("BroadcastHashJoin"))
  }

  test("semi/anti joins lower to the dedicated join types") {
    assert(plan("rel_semi_join").contains("LeftSemi"))
    assert(plan("rel_anti_join").contains("LeftAnti"))
  }

  test("q1 aggregation is partial+final hash agg (map-side combine)") {
    val p = plan("rel_q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial and final HashAggregate")
  }

  test("kNN broadcasts the probe side, never shuffles the scan side") {
    val p = plan("emb_knn")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }
}
