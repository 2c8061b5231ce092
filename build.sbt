ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vector_searchspark"
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
// The bench/verify mains print machine-parsed JSON contract lines on
// stdout. sbt's DEFAULT outputStrategy for forked runs is LoggedOutput,
// which routes the child's stdout through sbt's logger and prefixes
// every line with "[info] " (stderr with "[error] ") — that prefix is
// what defeated a plain `json.loads(line)` of the captured output for
// twelve rounds (BENCH_r01/r02 show the contract line COMPLETE in the
// tail yet unparsed, because it read "[info] {…}"). StdoutOutput makes
// the forked JVM inherit sbt's own stdout/stderr: contract lines pass
// through byte-for-byte, unprefixed, at column 0.
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
  // 24g default: the r9 bench degraded progressively on an 8g heap —
  // localCheckpoint blocks of the tokenized sf0.1 corpus from prior runs
  // pile into a 4.6 GiB storage budget until GC thrash inflates the last
  // queries' canaries (BENCH_r09 tx_corpus_ready canaries [0.32,2.39,…]
  // vs floor 0.169). The box has 128 GiB; 24g keeps block storage and
  // execution comfortably clear of the collector.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
