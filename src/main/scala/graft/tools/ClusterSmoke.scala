package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-executor smoke test (dev tool, like [[TimeQ]]): runs a
  * representative query slice on `local-cluster` mode — REAL separate
  * executor JVMs, so closure serialization, executor-side classloading
  * (MediaCodec's ImageIO init, typed-kernel lambdas) and codegen'd
  * custom expressions are exercised across process boundaries, which
  * `local[N]` can never do. This is the closest an offline container
  * gets to "would it run on a 1000-executor cluster".
  *
  * Launch (both env vars are required — the executor launcher needs a
  * full Spark layout and its Scala version, normally provided by
  * `load-spark-env.sh`):
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt "runMain graft.tools.ClusterSmoke"
  * }}}
  * Verified green (2 workers x 4 cores, Spark 4.1.2) on: the typed
  * kernel, multimodal decode, cosine-kNN, the jaccard pipeline, and a
  * streaming drain.
  *
  * `--all` caveat: `mm_ingest` and `rel_bucketed_join` stage fixture
  * state (temp media files / a warehouse dir) via
  * `GraftSession.stagingDir` — driver-local temp by default, which
  * works here because `local-cluster` executors share the driver's
  * host; on a real multi-node cluster set `SPARK_GRAFT_STAGING` to a
  * shared mount (verified: `SPARK_GRAFT_STAGING=<dir> sbt "runMain
  * graft.tools.ClusterSmoke mm_ingest rel_bucketed_join"` stages
  * under the override and both queries pass with executors scanning
  * it) — the query plans themselves are unchanged. The
  * drains' scratch trees (sink + checkpoint) have the same share-a-
  * filesystem assumption in this harness; production checkpoints go to
  * HDFS/S3 by construction.
  */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.GraftSession.configure(SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.memory", "2g")
      // Ship the sbt-compiled classes to the executor JVMs (sbt runs
      // from classes, not a jar, so nothing is shipped automatically).
      .config("spark.executor.extraClassPath",
        graft.sources.GraftSession.classesDir)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.find(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.001")
    // Default: a representative slice. `--all` runs the full query
    // surface distributed — the heavyweight pre-round check.
    // `--batches` runs the whole streaming matrix: every drain is
    // multi-micro-batch (split source, maxFilesPerTrigger=1) with a
    // hard data-batch-count assert, so this slice proves cross-batch
    // watermark/state semantics hold when the micro-batches execute on
    // SEPARATE executor JVMs (state store, checkpoint IO and the
    // listener-counted progress all crossing process boundaries).
    // Explicit query names as args run exactly those (e.g. the staging
    // queries under an overridden SPARK_GRAFT_STAGING root).
    val named = args.filter(graft.SparkEntry.queries.contains).toSeq
    val slice =
      if (args.contains("--all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.contains("--batches"))
        graft.SparkEntry.queries.keys.filter(_.startsWith("ev_stream")).toSeq.sorted
      else if (named.nonEmpty) named
      else Seq("mr_wordcount", "mm_metadata", "emb_knn",
        "dedup_ngram_jaccard", "ev_stream_hourly")
    var failures = 0
    slice.foreach { q =>
      try {
        val n = graft.SparkEntry.queries(q)(spark, sf).count()
        println(s"[cluster] $q OK ($n rows)")
      } catch { case e: Throwable =>
        failures += 1
        println(s"[cluster] $q FAILED: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(300))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
