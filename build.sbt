ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "resotodatalinkspark"
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
// The per-round perf artifact is the LAST stdout line of
// `sbt "runMain graft.Bench"`. sbt's "[success] Total time: ..." epilogue
// printed after the forked JVM exits made a parse-the-last-line driver
// record `parsed: null` three rounds running — silence it globally, and
// pass the forked JVM's stdout through RAW (no "[info] " logger prefix)
// so the final line is pure JSON.
Global / showSuccess := false
// (showSuccess is consumed by sbt's command engine, not a task — exclude
// it from the unused-key lint so batch output stays warning-free.)
Global / excludeLintKeys += showSuccess
run / outputStrategy := Some(StdoutOutput)
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
  // local[32] runs driver + all 32 executor threads in one JVM; on the
  // 128 GiB bench box an 8g heap GC-thrashes the shuffle-heavy dedup
  // queries. 32g ≈ 1g/core, the usual executor sizing.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // ~50 queries of whole-stage-codegen classes overflow the default
  // 240 MB code cache mid-run; when it fills, JIT compilation stops and
  // whichever query is running goes interpreted (observed as random
  // 10-30x per-query spikes late in a bench).
  "-XX:ReservedCodeCacheSize=1g",
)
