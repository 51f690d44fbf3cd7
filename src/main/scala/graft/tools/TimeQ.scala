package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch single-query timer (dev only — see .claude/skills/verify):
  * `sbt "runMain graft.tools.TimeQ <name> [sfDir] [reps]"`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.TimeQ <queryName> [sfDir] [reps]")
      sys.exit(2)
    }
    val name = args(0)
    if (!graft.SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; valid: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.sources.GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000L).selectExpr("id % 7 AS k", "md5(CAST(id AS STRING)) s")
      .groupBy("k").count().count() // warmup
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[timeq] $name rep$i: $dt%.3f s ($n rows)")
    }
    spark.stop()
  }
}
