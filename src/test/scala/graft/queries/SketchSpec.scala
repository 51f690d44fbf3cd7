package graft.queries

import graft.SparkSpec

/** Accuracy cross-checks for the rows-only sketch queries: the driver
  * only verifies non-emptiness for these (their output depends on
  * engine-local merge order), so each one is bounded here against its
  * exact oracle-backed counterpart on the same data.
  */
class SketchSpec extends SparkSpec {

  test("rel_approx_distinct stays within HLL's configured 1% error of exact") {
    import org.apache.spark.sql.functions._
    val approx = graft.SparkEntry.queries("rel_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // rsd = 0.01 is a standard deviation, not a hard bound — allow 4σ
      // (plus an absolute floor for tiny groups).
      assert(math.abs(a - e) <= math.max(4, 0.04 * e),
        s"$k: approx $a vs exact $e drifts past the error bound")
    }
  }

  test("txt_heavy_hitters CMS estimates never undercount and find the true top tokens") {
    import org.apache.spark.sql.functions._
    val est = graft.SparkEntry.queries("txt_heavy_hitters")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.documents(spark, sf001)
      .selectExpr(s"explode(${QueryModule.Tokens}) AS w")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS property: a bucket count is a sum over every colliding token,
    // so min-over-depth can only OVER-estimate.
    est.foreach { case (w, e) =>
      assert(e >= exact(w), s"'$w': CMS estimate $e undercounts exact ${exact(w)}")
    }
    // Recall: the exact top-5 must all surface in the estimated top-20
    // (4×1024 buckets vs a ~1k-word vocab keeps collisions rare).
    val top5 = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(5).map(_._1)
    top5.foreach { w =>
      assert(est.contains(w), s"true heavy hitter '$w' missing from CMS top-20")
    }
  }

  test("rel_approx_quantiles tracks the exact interpolating percentiles") {
    def byType(name: String): Map[String, Seq[Long]] =
      graft.SparkEntry.queries(name)(spark, sf001)
        .collect()
        .map(r => r.getString(0) -> Seq(r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    val approx = byType("rel_approx_quantiles")
    val exact = byType("rel_percentiles")
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, es) =>
      approx(k).zip(es).zipWithIndex.foreach { case ((a, e), i) =>
        // approx_percentile returns an actual data value at a rank
        // within n/accuracy of the target; the exact form interpolates
        // between neighbors — so the gap is bounded by local value
        // spacing, loose in the p99 tail. 5% relative (values are e6
        // fixed-point micros) is far above observed drift but far below
        // a wrong-percentile answer.
        assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1000000L),
          s"$k p${Seq(50, 90, 99)(i)}: approx $a vs exact $e")
      }
    }
  }
}
