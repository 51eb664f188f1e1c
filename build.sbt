ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "syntenybrowserv2etlspark"
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
// Pass the forked process's stdout through verbatim (no "[info] " log
// prefix) so graft.Bench's single JSON line is machine-parseable from
// the sbt output.
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
  // local[32] with 32 shuffle partitions needs headroom: at 8g the
  // 180-query bench spends whole seconds in full GCs that land on
  // random queries (measured: batch total 94s -> 79s at 24g on the
  // same data). Default 24g, clamped to half the detected physical
  // memory so a smaller host degrades with GC instead of getting
  // OOM-killed; override via SPARK_DRIVER_MEM either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    // Fallback is CONSERVATIVE (16 GiB -> -Xmx8g): detection fails
    // exactly on nonstandard JVMs/containers where the host may be
    // small, so assuming a big box there would reproduce the
    // OOM-kill this clamp exists to prevent. A real big box that
    // fails detection still has SPARK_DRIVER_MEM as the override.
    val physGb =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getTotalMemorySize >> 30
      catch { case _: Throwable => 16L }
    s"${math.min(24L, math.max(4L, physGb / 2))}g"
  })}",
)
