ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rel_db_to_graphspark"
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
  // Measured on the full sf0.1 bench (local[32]): 8g -> 67.7s, 16g ->
  // 70.1s, 48g -> 222s. A huge max heap lets G1 balloon between rare,
  // enormous collections and triples wall-clock; storage eviction under
  // the small heap is cheaper than the GC pathology of the big one.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput GC for the batch workload: back-to-back sf0.1 benches
  // measured G1 at 66.7/77.0s with random 3-8s spikes on individual
  // queries (q45 2.4s -> 10.0s between runs) vs ParallelGC 64.5s with
  // no spikes — G1's pause-time goal buys latency this batch pipeline
  // never needs and pays it in mutator throughput. Override via
  // SPARK_GRAFT_GC if a pause-sensitive consumer embeds the library.
  s"-XX:+${sys.env.getOrElse("SPARK_GRAFT_GC", "UseParallelGC")}",
)
