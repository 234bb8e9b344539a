ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "boatracedatabasespark"
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
// The bench/verify mains print ONE machine-parsed JSON line. sbt's
// default LoggedOutput prefixes every forked-process line with
// "[info] " and appends its own "[success] Total time" footer — four
// rounds running that left the driver's bench artifact unparseable
// (the JSON line never starts with '{' and is never last). Route the
// forked process's stdout/stderr straight through, and drop sbt's
// success/timing footer so the program's own output is the tail.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// these keys are consumed by commands/forked-run config, not settings —
// sbt's unused-key linter cannot see that
Global / excludeLintKeys ++= Set(run / outputStrategy,
  Global / showSuccess, Global / showTiming)
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
  // local[32] means up to 32 concurrent tasks sharing this one heap:
  // 8g starved the unified memory pool at sf0.1 (spilled sorts, GC),
  // taxing exactly the queries a real cluster would run comfortably.
  // The machine has 128 GiB; 28g leaves room for the test JVM, sbt,
  // and the driver's DuckDB oracle.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)
