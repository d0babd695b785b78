ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkprojectspark"
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
  // r18: default heap 8g -> 20g. local[32] runs driver AND all executor
  // threads in ONE JVM, so 8g gave 32 concurrent tasks ~256 MB each
  // (unified memory region 4.6 GiB) — GC-bound on the aggregate-heavy
  // queries (guide §5: more memory per concurrent task). Reversed-order
  // iso A/B at sf0.1: q96 12.8->10.6, q152 3.0->2.3, q66 3.0->2.8.
  // 20g is ~16% of the 128 GiB sandbox; a cluster deployment sizes
  // executor memory per core instead, so this is a local-mode knob, and
  // it stays env-overridable for smaller hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
) ++
  // r19: opt-in GC logging for the heap-size A/B the r18 verdict asked
  // for (SPARK_GC_LOG=/tmp/gc.log adds -Xlog:gc to the forked JVM);
  // absent by default — no behavior change for the driver's bench
  sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc:$f").toSeq
