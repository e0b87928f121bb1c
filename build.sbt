ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "trackertrainerspark"
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
// Forked `run` output must pass through UNPREFIXED: the bench driver
// parses the final stdout JSON line, and sbt's default LoggedOutput
// wraps every line in "[info] " which breaks that parse.
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
  // 12g default, measured both ways: local[32] runs 32 concurrent
  // tasks in ONE JVM — at 8g (~250 MB execution memory per task slot)
  // the late-suite GBT fits hit old-gen GC thrash (q_rdr_train 42.2 s
  // median in full-suite position vs ~15 s isolated), while at 20g the
  // deserialized-row caches of the dedup build bloat the heap and GC
  // churn makes the pair-graph setup ~1.6x SLOWER (warmDerived 24.5 s
  // @8g / 22.2 s @12g / 37.9 s @20g, same box back-to-back). 12g holds
  // both: train ~15 s AND setup ~14-20 s. SPARK_DRIVER_MEM overrides
  // for smaller hosts; the driver's lower-core runs need less.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
