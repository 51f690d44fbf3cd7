package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch plan printer (dev only): `sbt "runMain graft.tools.ShowPlan
  * <queryName> [sfDir]"` — prints the executed physical plan, using the
  * gated-inner-plan registry for rows-only queries (whose returned
  * LocalTableScan hides the real plan, same as PlanShapeSpec). */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.ShowPlan <queryName> [sfDir]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.sources.GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val inner = graft.queries.QueryModule.gatedPlans.get(name)
    val plan = (if (inner != null) inner else df).queryExecution.executedPlan
    println(plan.toString)
    spark.stop()
  }
}
