ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "carsbidsdatapipelinev0spark"
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
  // 16g: local[32] runs 32 concurrent tasks in the one driver JVM; at 8g a
  // long many-query session spent measurable time in GC (storage + shuffle
  // + 32 task working sets), which contaminated per-query timings
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The JVM's JIT code cache (default 240m) is too small for a 100+-query
  // session: every query adds whole-stage-codegen classes, and once the
  // cache fills the JVM silently flushes cold compiled methods — hot
  // codegen'd operators then run interpreted/deoptimized, inflating a
  // query's task CPU 3-11x at random (no warning until the compiler hard-
  // disables; gc and steal telemetry stay flat). Measured on the full
  // bench: total 121s -> 69s, worst single query 49s -> 9s. Reserved
  // address space, committed on demand — oversizing costs ~nothing.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "2g")}",
)
