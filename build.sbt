ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lucenespark"
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
  // 12g measured: headroom for 32 flush buffers + Tungsten write-sort; a 32g heap makes 32-thread runs ~7x slower (G1
  // young-gen pathology at large heaps on this kernel); see BASELINE.md §3
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // pin + pre-touch the heap and keep it committed (ParallelGC never
  // uncommits): without this the heap shrinks between bench phases and the
  // 32-thread build's allocation storm re-faults pages while the box is
  // fragmented — kernel compaction charged as task CPU made n32 runs
  // bimodal (52 s vs 642 s on identical code; BENCH_r03 evidence_n32
  // task-CPU 19x n2's at identical bytes_written)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_EXTRA_JVM_FLAGS").toSeq.flatMap(_.split("\\s+").toSeq
)
