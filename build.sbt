ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jasminegraphspark"
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
// Forked runMain stdout goes through sbt's logger by default, which
// prefixes every line with "[info] " — the driver's JSON-line scrape of
// graft.Bench then has to strip the tag. StdoutOutput passes the forked
// process stdout through verbatim, so the bench's JSON lines land clean.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default: an 8g heap left the full 126-query bench one GC spike
  // away from an executor-thread OOM (observed once — fatal, stops the
  // SparkContext); the box has 125 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The 160-query bench generates enough whole-stage-codegen classes to
  // exhaust JDK17's default 240 MB code cache mid-run — the JIT then
  // silently stops compiling and later queries run partially interpreted
  // (measured 3-10x inflation of late queries vs isolated runs). Size it
  // so a full sweep stays JIT-compiled; flushing guards the tail.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
