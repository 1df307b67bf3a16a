ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "toymapreducegospark"
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
// Forked run output goes straight to this process's stdout/stderr —
// without this, sbt re-logs every line with an "[info] " prefix, which
// breaks the driver's parse of Bench's one-line JSON contract.
run / outputStrategy := Some(StdoutOutput)
// The round-driver captures only the tail of stdout and parses the last
// JSON line; sbt's trailing "[success] Total time ..." line must not
// displace it out of that window.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
) ++ Seq(
  // GC pin (round 15, SCALING.md "aged-session" section): the r14
  // mechanism hunt showed long catalog sessions intermittently lose
  // cores to G1 background work while reported STW time stays small,
  // inflating recorded medians on allocation-heavy queries by up to
  // 2.5x with flat minimums. Parallel (throughput) GC has no concurrent
  // phases and no humongous-region class — the full-catalog A/B at
  // sf0.1 is recorded in SCALING.md. Overridable for A/Bs without a
  // build edit via SPARK_GRAFT_JVM (extra flags win by position).
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_GRAFT_JVM").map(_.trim).filter(_.nonEmpty)
  .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
