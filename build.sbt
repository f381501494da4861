ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "watermillkinesisspark"
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
// Forked-run output bypasses sbt's logger: the driver parses
// graft.Bench's one-line JSON out of the captured stdout tail, and
// the default LoggedOutput strategy prefixes every line with
// "[info] ", leaving no bare-JSON line to parse (every prior round's
// BENCH_r*.json recorded parsed=null with the complete line visible
// in the tail). StdoutOutput inherits this process's stdio instead.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 188 distinct plans compile thousands of Janino/codegen classes;
  // at the JDK-17 default (240m) the code cache fills mid-capture and
  // the JIT starts flushing hot compiled methods — measured: a full
  // 188-query capture ran 129.9 s at the default vs 124.7 s at 1g
  // under the same load regime, with the late composed heavies
  // paying most (a27 3.4→2.6, q46 3.2→2.6, p7 3.5→2.6, d21 4.4→3.7).
  // Reserved address space, not committed memory — effectively free.
  "-XX:ReservedCodeCacheSize=1g",
)
