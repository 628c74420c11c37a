ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusiondftspark"
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
// wire stdin through to forked runs (interactive CLI REPL)
run / connectInput := true
// Forked run output passes through UNPREFIXED: sbt's default LoggedOutput
// wraps every stdout line of a forked main in "[info] ", which is what has
// kept the bench driver's JSON extractor from parsing the summary line
// (BENCH_r18/19/20 all record parsed:null on an intact line). StdoutOutput
// writes the child's stdout straight through, so the one-line summary JSON
// reaches the driver bare.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Spark whole-stage codegen emits fresh classes per query; a long query
  // list overflows the 240m default code cache and HotSpot's
  // flush/recompile cycles then run hot loops interpreted (measured: the
  // benchmark's concurrent section collapsed 60x once the serial list had
  // filled the cache). Reserved ≠ committed, so 1g costs address space
  // only.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_GC_LOG").map(p => s"-Xlog:gc*:file=$p:time,uptime").toSeq ++
  sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
