ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "asafavivdevopsasafavivdevopstidbcdcspark"
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
// The driver parses the bench's final stdout JSON line out of a bounded
// output tail; sbt's default LoggedOutput decorates every forked-run line
// with an "[info] "/"[error] " prefix and appends a "[success] Total time"
// banner AFTER it — which kept BENCH_r{5,6,7}.json at "parsed": null.
// Pass forked output through verbatim and drop the success banner so the
// bench's JSON line is the last, undecorated line on stdout.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
// local[32] with an 8g heap full-GC-stalls unpredictably (10-40 s pauses
// mid-query); the bench box has 128 GiB — give the single-JVM "cluster" the
// memory a real 32-core executor would get. Default: min(48g, ~40% of
// physical RAM) so smaller hosts still start; SPARK_DRIVER_MEM overrides.
val driverHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val memTotalGb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal")).map(_.filter(_.isDigit).toLong / (1024 * 1024))
      .getOrElse(20L)
    catch { case _: Throwable => 20L }
  s"${math.max(2L, math.min(48L, memTotalGb * 2 / 5))}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
  "-XX:+UseG1GC",
  // Whole-stage codegen emits one or more JIT-compiled classes per query;
  // a 70-query run overflows the default 240 MB code cache, flushing then
  // evicts the shared hot library methods (Jackson, regex) between uses,
  // and row work silently drops to the interpreter — 10-100x slowdowns
  // (plus a GC storm: interpreted code gets no escape analysis) that look
  // like random per-query degradation late in a run.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:+UseCodeCacheFlushing",
  // Every query loads fresh codegen classes, which invalidates profiles and
  // deoptimizes the shared expression-eval library methods (Jackson/JSON,
  // regex) over and over; once a method crosses HotSpot's recompilation
  // cutoff it is marked not-compilable and runs INTERPRETED for the rest of
  // the JVM — observed as 10-20x task-CPU inflation on whichever queries ran
  // after the cutoff hit. Lift the cutoffs and add compiler threads so
  // recompilation converges instead of giving up.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
  "-XX:CICompilerCount=16",
) ++ (if (sys.env.contains("SPARK_GRAFT_EVENTLOG"))
        Seq("-Dspark.eventLog.enabled=true",
            "-Dspark.eventLog.dir=/tmp/spark-events")
      else Seq())
