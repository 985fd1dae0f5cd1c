ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "thanosparquetgatewayspark"
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
// Forked runMain output goes RAW to stdout (no sbt "[info] " prefix):
// graft.Bench's contract is machine-parsed JSON lines, and the prefix is
// what kept the driver's bench parse at `parsed: null` for five rounds.
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

// ---- parallel test groups ----
// Sequential, the suite is ~37 min of wall (r21 target/test-reports sum:
// 2245 s) and the round driver's `sbt test` window killed it mid-run
// (VERDICT r21 item 1). Suites are independent — unique
// Files.createTempDirectory scratch dirs, ephemeral (port-0) HTTP/gRPC
// binds, per-JVM in-memory catalog, explicit-path bucketed writes — so run
// them in parallel forked JVMs, LPT-packed by measured r21 suite seconds.
// Makespan becomes ~the slowest single suite (PromqlGoldenSpec, ~8 min).
// Weights only steer packing; a new/renamed suite defaults to 30 s.
val suiteSeconds: Map[String, Int] = Map(
  "graft.PromqlGoldenSpec" -> 482,
  "graft.PromqlHistogramSpec" -> 333,
  "graft.EtlSpec" -> 284,
  "graft.PromqlUpstreamSpec" -> 236,
  "graft.QueriesSpec" -> 150,
  "graft.PromqlFuzzSpec" -> 145,
  "graft.NativeHistogramPropSpec" -> 131,
  "graft.HistLayerRouteSpec" -> 125,
  "graft.LayerRouteSpec" -> 114,
  "graft.PromXorSpec" -> 64,
  "graft.StreamingSpec" -> 41,
  "graft.PromqlHistogramFuzzSpec" -> 36,
  "graft.PromqlSpec" -> 34,
  "graft.EvalSpec" -> 28,
  "graft.HttpApiSpec" -> 12,
  "graft.NativeHistogramSpec" -> 9,
  "graft.QuotasSpec" -> 8,
  "graft.StoreApiSpec" -> 5,
  "graft.PlanRuleSpec" -> 4,
  "graft.HammingNearPairsSpec" -> 2,
)
val testGroups = 6 // 6 JVMs x local[8] Spark on 32 cores; 6 x Xmx8g heaps
Test / testGrouping := {
  val jvmOpts = (Test / javaOptions).value.toVector
  val loads = Array.fill(testGroups)(0L)
  val members = Array.fill(testGroups)(List.empty[TestDefinition])
  for (t <- (Test / definedTests).value
         .sortBy(t => (-suiteSeconds.getOrElse(t.name, 30), t.name))) {
    val i = loads.indexOf(loads.min)
    loads(i) += suiteSeconds.getOrElse(t.name, 30)
    members(i) ::= t
  }
  members.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    Tests.Group(s"g$i", ts, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(jvmOpts)))
  }
}
// sbt's default restrictions cap forked test groups at 1 — lift it.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroups),
  Tags.limitAll(32),
)
