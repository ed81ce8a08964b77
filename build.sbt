ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deltalakepysparkscd2spark"
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
// Forked run/runMain output goes STRAIGHT to stdout instead of through
// sbt's logger: the bench/verify mains emit machine-parsable JSON lines,
// and the logger's "[info] " prefix breaks any json parse of the captured
// output (every BENCH_r*.json carried "parsed": null because of it).
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // local[32] on a 128 GiB host: 24g keeps long bench runs (39 queries +
  // four volume-scaling tables in one JVM) out of old-gen GC pressure
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // zstd-jni compresses through JNI critical regions; with 32 executor
  // threads those regions overlap constantly and JDK 17 aborts an
  // allocation after only TWO GCLocker retries — throwing heap OOM
  // ("Retried waiting for GCLocker too often") while most of the heap
  // is reclaimable garbage. Raising the retry count is the canonical
  // fix (measured: the 300× scale rows died of this, not of live data).
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
