package graft.plans

import graft.SparkSpec

/** The optimizer rule's semantics guards, end to end on real frames:
  * the rewrite must fire exactly when "inner join" and "at most one
  * CASE branch" are the same operation, and the two forms must agree
  * row for row (incl. NULL probe values and boundary hits) whenever
  * it does.
  */
class RangeBandRewriteSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def bandsDf(rows: Seq[(String, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("band", "lo", "hi")
  }

  // Parquet-backed (not a LocalRelation): with a local fact the
  // rewritten Filter+Project folds straight into a LocalTableScan —
  // correct, but leaving no plan to inspect.
  private lazy val factPath: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rbr_")
      .resolve("fact").toString
    // Boundary values on both edges, a NULL, and out-of-range rows.
    Seq[(Long, Option[Double])](
      (1L, Some(0.0)), (2L, Some(49.999)), (3L, Some(50.0)),
      (4L, Some(99.999)), (5L, Some(100.0)), (6L, Some(250.0)),
      (7L, None), (8L, Some(-3.0)), (9L, Some(1e9))
    ).toDF("id", "value").write.parquet(dir)
    dir
  }

  private def factDf() = spark.read.parquet(factPath)

  private val disjoint = Seq(
    ("a", 0.0, 50.0), ("b", 50.0, 100.0), ("c", 100.0, 200.0))

  test("fires on disjoint literal bands: no join operator remains") {
    val joined = factDf().join(bandsDf(disjoint),
      col("value") >= col("lo") && col("value") < col("hi"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"rewrite did not fire:\n$p")
    assert(p.contains("CASE WHEN"), "expected the CASE ladder")
  }

  test("rewritten output equals the (rule-disabled) join, row for row") {
    val cond = col("value") >= col("lo") && col("value") < col("hi")
    val got = factDf().join(bandsDf(disjoint), cond)
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(identity).toSeq
    // Ground truth from the same semantics without the rule: an
    // explicit per-band union of range filters.
    val expected = disjoint.flatMap { case (b, lo, hi) =>
      factDf().where(col("value") >= lo && col("value") < hi)
        .select("id").collect().map(r => (r.getLong(0), b))
    }.sortBy(identity)
    assert(got == expected)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L),
      "boundary rows must land in the half-open band; NULL and " +
        "out-of-range rows must drop")
  }

  test("does NOT fire on overlapping bands (join may multiply rows)") {
    val overlapping = Seq(("a", 0.0, 60.0), ("b", 50.0, 100.0))
    val joined = factDf().join(bandsDf(overlapping),
      col("value") >= col("lo") && col("value") < col("hi"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("Join"), "overlap must keep the real join")
    // And the join semantics the ladder can't express: 50.0 matches both.
    val hits = joined.where(col("id") === 3).count()
    assert(hits == 2)
  }

  test("does NOT fire on outer joins or mixed-side extra conjuncts") {
    val leftOuter = factDf().join(bandsDf(disjoint),
      col("value") >= col("lo") && col("value") < col("hi"), "left")
    assert(leftOuter.queryExecution.executedPlan.toString.contains("Join"))
    // A single-side extra conjunct (id =!= 2) is NOT a counterexample:
    // Catalyst pushes it below the join first, leaving the pure range
    // condition — the rewrite then firing is correct. A MIXED-side
    // conjunct cannot be pushed, so it must veto the rewrite.
    val extra = factDf().join(bandsDf(disjoint),
      col("value") >= col("lo") && col("value") < col("hi") &&
        col("id") + col("lo") > 1)
    assert(extra.queryExecution.executedPlan.toString.contains("Join"))
  }
}
