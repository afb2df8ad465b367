ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduce6240projectspark"
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
// Forked runs default to sbt's LoggedOutput strategy, which prefixes every
// line the child JVM prints with "[info] "/"[error] " — that prefix is the
// ONLY reason the bench's compact JSON line (already <1400 B and inside the
// captured 2000-char tail) failed to parse in rounds 1-6. StdoutOutput
// inherits the parent's raw stdout/stderr, so `println(json)` arrives bare.
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
  // 60+ whole-stage-codegen queries x 3 bench reps overflow the 240m
  // default JIT code cache -> flushing/deopt churn showed up as
  // intermittent 10-50x slowdowns mid-bench; headroom removes it
  // 94 registry queries x 3 bench reps of whole-stage codegen overflowed
  // 512m the same way 66 x 3 overflowed the JDK default 240m in round 2
  // (flush/deopt churn: q65 0.3s -> 20s -> 141s, instant recovery on the
  // next query); 1g held the builder's full-suite run but NOT the round-3
  // driver run, so round 4 (a) chunks the bench across fresh child JVMs
  // (Bench.scala — no JVM compiles more than ~chunk x reps queries) and
  // (b) reserves 2g as belt-and-braces for the inline fallback path
  // (reserve is address space, not committed memory)
  "-XX:ReservedCodeCacheSize=2g",
)
