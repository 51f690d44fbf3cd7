ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "os_ex_3_map_reducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that both breaks parsing the one-line
// JSON bench report and wastes 7 chars of the harness's 2000-char
// stdout tail window. Inherit stdout instead.
run / outputStrategy := Some(StdoutOutput)
// The bench/verify harness surfaces only the tail of stdout; sbt's
// closing "[success] Total time: ..." line would displace the tail end
// of the one-line JSON report, so suppress it.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g A/B'd (r9): sweep GC seconds halve but bench totals don't
  // move (116.4 s vs 117.8 s, busier window) — the bench JSON's noise
  // markers show host contention dominates, so 8g stands.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~70 queries of whole-stage-codegen classes can fill the default
  // 240 MB reserved code cache mid-run; when that happens the JIT shuts
  // off and later hot loops run interpreted (observed: the 2M-pair
  // cosine join intermittently 6-20x slower late in a bench sweep).
  "-XX:ReservedCodeCacheSize=1g",
)
