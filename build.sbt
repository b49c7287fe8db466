ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtime_analytics_with_kafka_clickhousespark"
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
// The driver parses graft.Bench's single JSON stdout line; sbt's default
// LoggedOutput prefixes forked output with "[info] ", which breaks a plain
// json.loads per line. Pass the child's stdout/stderr through untouched.
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
// Scratch I/O (r18, guide §6): everything transient — streaming
// checkpoints/state, drained fixture segments, shuffle spill
// (spark.local.dir defaults to java.io.tmpdir) — goes to the fastest
// local storage available. On this sandbox /tmp is ext4-on-disk while
// /dev/shm is tmpfs; pointing scratch at tmpfs cut the fsync-bound
// streaming drains ~9%. Production equivalent: NVMe local dirs for
// shuffle/state scratch, with DURABLE checkpointLocation for real
// streams (the fixture drains' checkpoints are per-run temp dirs by
// design). Override with GRAFT_SCRATCH_DIR=/path, or set it to a
// disk path to opt out.
val scratchDir: Option[String] = {
  val pick = sys.env.get("GRAFT_SCRATCH_DIR").orElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft_scratch")
    else None
  }
  pick.filter { p => val f = new java.io.File(p); f.mkdirs(); f.canWrite }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ scratchDir.map(d => s"-Djava.io.tmpdir=$d").toSeq
