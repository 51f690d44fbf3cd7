package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.sources.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One throwaway action so JVM/codegen warmup isn't billed to
    // whichever query happens to run first (timings then compare
    // across rounds query-by-query). The shape matters: a bare
    // range-sum leaves the shuffle/join/window/codegen machinery cold
    // and bills its JIT to the first few queries alphabetically (the
    // dedup family), so touch each path once.
    // Throwaway work: a warmup failure must not abort the whole bench
    // (the per-query error accounting below is the failure channel).
    try {
      val warm = spark.range(200000L)
        .selectExpr("id", "id % 97 AS k", "md5(CAST(id AS STRING)) AS s")
      warm.groupBy("k")
        .agg(org.apache.spark.sql.functions.countDistinct("s").as("d"))
        .join(warm.select("k", "id").limit(1000), "k")
        .selectExpr("k", "d", "row_number() OVER (PARTITION BY k ORDER BY id) AS rn")
        .count()
      ()
    } catch {
      case e: Throwable => System.err.println(s"[bench] warmup FAILED: ${e.getMessage}")
    }
    // Stable (sorted) execution order for the same reason.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def sweep(): Seq[(String, Double)] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      // Elapsed captured BEFORE cache teardown so unpersist cost isn't
      // billed to the query being timed.
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Queries persist intermediates (shingle indexes, LSH sketches);
      // drop them so later queries aren't timed against a polluted
      // block manager.
      spark.catalog.clearCache()
      // A failed query reports -1 so it can't masquerade as a speedup.
      name -> (if (ok) elapsed else -1.0)
    }
    // Two full sweeps, report the per-query MINIMUM: this machine shares
    // a host, and a transient noisy-neighbor window has been observed to
    // inflate a sweep ~3x end to end — min-of-2 keeps a round-over-round
    // comparison about the code, not about which minute it ran in. A
    // query counts as an error only if it failed in BOTH sweeps.
    val p1 = sweep()
    val p2 = sweep()
    val results = p1.zip(p2).map { case ((name, a), (_, b)) =>
      name -> ((a < 0, b < 0) match {
        case (true, true) => -1.0
        case (true, _)    => b
        case (_, true)    => a
        case _            => math.min(a, b)
      })
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Failures are excluded from the headline total (a -1 would shrink
    // it, reporting a regression as a speedup); the explicit top-level
    // errors count keeps a round-over-round total comparison from
    // reading a breakage as a speedup.
    val errors = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","errors":$errors,"passes":2,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
