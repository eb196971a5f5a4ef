ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlfinancialreportspark"
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
// Forked run output goes straight to stdout WITHOUT sbt's "[info] "
// prefix — the bench/verify JSON lines must start at column 0 so the
// driver's line parser recognizes them (BENCH_r01..r04 all recorded
// parsed:null because every line arrived as "[info] {...}").
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
  // 24g of the machine's 128 GiB: local[32] runs 32 concurrent tasks in
  // ONE JVM, so executor+driver memory share this heap — 8g left heavy
  // shuffle queries GC-thrashing and contaminated every later timing
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 189 queries x dozens of whole-stage-codegen classes each: the JVM
  // default 240 MB code cache fills mid-suite, the JIT silently stops
  // compiling, and later queries run partially interpreted (the same
  // shingle stage measured 17 s CPU early in a session vs 77 s late).
  // Raised 1g -> 2g in round 9: at 189 queries the 1g cache refilled
  // near the v-family and v09's HLL aggregate ran 8.8x its isolated
  // CPU (475 s in-suite vs 54 s alone, identical stage counts) —
  // same signature, later onset. 2g is the JVM's HARD MAXIMUM for
  // ReservedCodeCacheSize.
  "-XX:ReservedCodeCacheSize=2g",
) ++ sys.env.get("GRAFT_EXTRA_JVM").toSeq.flatMap(_.split("\\s+"))
