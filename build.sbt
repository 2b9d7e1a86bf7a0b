ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spark_streaming_kafka_offsetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Kafka wire activation (KafkaWireSpec): point SPARK_KAFKA_JARS at a
// directory holding spark-sql-kafka-0-10 + kafka-clients jars and set
// GRAFT_KAFKA_BOOTSTRAP=host:port — the wire spec then runs with zero
// code changes. Absent the env var this contributes nothing.
Compile / unmanagedJars ++= sys.env.get("SPARK_KAFKA_JARS")
  .map(dir => (file(dir) ** "*.jar").classpath)
  .getOrElse(Seq.empty)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Keep Bench/Verify's final JSON line the LAST, UNPREFIXED stdout line:
// the driver captures a bounded stdout tail and parses the last line,
// but sbt's "[success] Total time" trailer displaced it (every
// BENCH_r0N recorded "parsed": null) and the logger's "[info] " prefix
// on forked-run output would still break a bare json parse.
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
