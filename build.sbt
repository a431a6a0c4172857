ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gvcfhbasespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites MUST run sequentially inside the forked test JVM:
// WritePathAuditSpec swaps the process-global java.io.tmpdir property
// and derives its write-path set from the process-global
// graft.ScratchObserver counter — concurrent suites would bleed their
// buildOnce/manifest touches into its per-query delta and produce
// nondeterministic false drift failures. These are sbt's defaults, but
// the audit's correctness depends on them, so pin both explicitly.
Test / parallelExecution := false
Test / testForkedParallel := false
run / fork := true
// Forked run output goes straight to stdout (no sbt "[info] " prefix) —
// the bench/verify harness needs machine-parseable lines that start
// with '{' at column 0.
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
)
// Pinned heap (Xms = Xmx) + pre-touch for the bench/verify runs only:
// G1 otherwise uncommits regions after a collection and the next
// allocation-heavy query re-pays the page-commit cost inside its
// measured window — run-to-run bench noise (SCALE.md, bench variance).
// Scoped to `run` so test forks keep a modest unpinned heap and small
// hosts can still run `sbt test`.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
