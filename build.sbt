ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "local_pubchem_dbspark"
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
// Pass the forked run's stdio through verbatim: the default logger
// strategy re-tags every child line with [info]/[error], which is
// what broke the driver's parse of Bench's one-line JSON metrics in
// BENCH_r10 ("parsed": null — the line arrived as `[info] {...}`).
run / outputStrategy := Some(StdoutOutput)
// Suites share one SparkSession and several temporarily flip session
// confs (codegen, maxPartitionBytes, autoBroadcastJoinThreshold);
// parallel suite execution would race those mutations. With
// fork := true the governing setting is testForkedParallel (default
// false — pinned here so a future change can't silently re-enable
// the race); parallelExecution covers any non-forked path.
Test / parallelExecution := false
Test / testForkedParallel := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
