import org.apache.spark.sql.SparkSession
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("micro").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("rel_percentiles", "mm_batch_stats"); i <- 1 to 6) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).collect()
      println(f"$q run$i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
