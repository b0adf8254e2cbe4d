ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphdb_neo4jspark"
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
// Stream the forked JVM's stdout/stderr through UNPREFIXED (r13): the
// default LoggedOutput wraps every line in sbt's "[info] " logger
// prefix, which is why the bench driver's log-tail parser recorded
// parsed:null through r12 — the JSON result line never appeared as a
// bare line. With StdoutOutput the child's stdout passes through
// verbatim, so the final line of `sbt "runMain graft.Bench"` IS the
// JSON line.
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
  // r17: extra -D flags for config A/B experiments (e.g.
  // SPARK_GRAFT_EXTRA_OPTS="-Dspark.sql.adaptive...=false"); empty by
  // default, so the shipped configuration is unchanged
  ) ++ sys.env.get("SPARK_GRAFT_EXTRA_OPTS").toSeq
    .flatMap(_.trim.split("\\s+").filter(_.nonEmpty)) ++ Seq(
  // 16g default: the test JVM runs every suite against one shared
  // session; at 8g the accumulated broadcasts/caches of 19 suites
  // could flake a late broadcast build (host has 128g)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
