ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlpipelinefreshpickedleadsspark"
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
// Pass forked-run output through raw: sbt's default LoggedOutput prefixes
// every stdout line with "[info] ", which breaks the round driver's
// json.loads on Bench's one-line JSON (BENCH_r1/r3 parsed:null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// r19 (verdict #5): the full suite ran 68 min sequentially — past the round
// driver's budget (r18 recorded tests_ok=false from a budget kill mid-run,
// not from a failure). Per-suite timing of that run: FuzzSpec 21 min,
// StreamFuzzSpec 17, StreamCutFuzzSpec 8.4, MetamorphicSpec 8, 
// QueryCatalogSpec 6.7, everything else ~7 combined. The five heavy suites
// now fork into their own JVMs and run concurrently — each gets its own
// JVM-private Spark session, so there is no shared-session state to race —
// and the remaining suites share one JVM with suite-level parallelism.
// Wall becomes max(slowest suite), not the sum. Suites WITHIN a JVM stay
// sequential (testForkedParallel broke three tests in validation: the
// CacheManager is SharedState — PlanSignatureSpec's clearCache raced
// AnnSpec's localCheckpoint release and dd-query cache substitution
// shifted two plan signatures mid-suite; several specs document the
// "suites are sequential in this JVM" assumption). Cross-JVM there is no
// shared mutable state: PersistedTableCache/CacheManager are per-JVM
// in-memory, temp dirs are per-JVM, corpus reads are read-only.
Test / testGrouping := {
  val heavy = Set("graft.FuzzSpec", "graft.FuzzSpecMid", "graft.FuzzSpecLate",
    "graft.StreamFuzzSpec", "graft.StreamCutFuzzSpec", "graft.MetamorphicSpec",
    "graft.QueryCatalogSpec")
  val fo = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
  val (big, rest) = (Test / definedTests).value.partition(t => heavy(t.name))
  big.map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(fo))) :+
    Tests.Group("rest", rest, Tests.SubProcess(fo))
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(10), Tags.limit(Tags.ForkedTestGroup, 8))
