package graft.tools
import org.apache.spark.sql.SparkSession
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.sources.GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 8)
        .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         (ef, efC, m, deg) <- Seq((12, 32, 8, 16), (12, 48, 12, 24),
           (16, 32, 8, 16), (16, 48, 12, 24), (16, 64, 16, 32),
           (20, 48, 12, 24))) {
      val res = graft.queries.EmbeddingQueries.hnswProbe(s, dir, ef, efC, m, deg)
      println(s"PROBE dir=$dir ef=$ef efC=$efC m=$m deg=$deg $res")
    }
    s.stop()
  }
}
