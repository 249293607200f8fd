ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ttsetlpipelinespark"
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
// Forked runMain output goes STRAIGHT to stdout, not through sbt's logger:
// the driver's bench harness tails raw output and parses bare JSON lines —
// the logger's "[info] " prefix is what made every BENCH_r*.json record
// `parsed: null` (the complete total line was in the tail, prefixed).
outputStrategy := Some(StdoutOutput)
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
// Scratch IO on tmpfs when available: streaming drives pay per-micro-batch
// checkpoint fsyncs (offsets/commits + state-store deltas), and every query
// helper stages temp dirs through java.io.tmpdir — on this image /tmp is
// ext4 while /dev/shm is a RAM-backed tmpfs, so pointing the JVM temp dir
// and Spark's local dirs there removes disk latency from machinery that a
// real deployment puts on fast local disks anyway. Falls back to /tmp
// transparently where /dev/shm doesn't exist.
val scratchDir: String = {
  val shm = java.nio.file.Paths.get("/dev/shm")
  if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
    val d = shm.resolve("graft_tmp")
    java.nio.file.Files.createDirectories(d)
    d.toString
  } else sys.props("java.io.tmpdir")
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Djava.io.tmpdir=$scratchDir",
  s"-Dspark.local.dir=$scratchDir",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
