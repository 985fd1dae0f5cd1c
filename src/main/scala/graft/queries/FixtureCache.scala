package graft.queries

/** Build-once-per-JVM store fixtures for the oracle/bench queries that
  * exercise a PERSISTED layout (reference bucket, chunked store, downsample
  * layer, TSDB block).
  *
  * The reference's own benchmarks split ETL from serving: `BenchmarkConverter`
  * times conversion once, the select benchmarks then run against the
  * pre-built bucket (the `search` package tests). Our store-backed queries originally
  * re-converted inside every invocation, so a sweep re-paid identical ETL
  * work several times over — three queries build the very same 2-shard
  * reference bucket — and repeat runs measured conversion, not serving.
  * Caching the built store per (data dir, fixture) keeps each query function
  * self-contained (first caller pays the build) while repeat invocations
  * measure what the reference measures: the serving path.
  *
  * Correctness is unaffected: every cached build is a deterministic function
  * of the driver-provided tables under `dataDir` (the oracle gate hash-checks
  * that determinism every round), and the stores are read-only after build.
  */
object FixtureCache {
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } finally stream.close()
    }
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.values.forEach { d =>
      try deleteRecursively(java.nio.file.Paths.get(d))
      catch { case _: Exception => () }
    }
  }))

  /** An UNCACHED temp directory, registered for the same shutdown-hook
    * cleanup as cached fixtures. For queries that must re-run their build
    * every invocation (the conversion benchmark: timing the ETL is the
    * point, so caching would change what the bench measures).
    *
    * Re-entry hygiene: one long JVM sweeping with repeats would otherwise
    * accumulate a dir per invocation until shutdown, so the PREVIOUS
    * scratch of the same name is deleted (and deregistered) before the new
    * one is handed out — at most one live scratch dir per name. */
  def scratch(name: String): String =
    // create + delete-previous run atomically per name (ConcurrentHashMap
    // locks the bin during compute): two concurrent scratch(name) calls
    // serialize, so neither can delete a dir the other just handed out
    scratchByName.compute(name, (_, prev) => {
      if (prev != null) {
        dirs.remove((prev, "scratch"))
        try deleteRecursively(java.nio.file.Paths.get(prev))
        catch { case _: Exception => () }
      }
      val out = java.nio.file.Files.createTempDirectory(s"graft-fx-$name-")
      dirs.put((out.toString, "scratch"), out.toString)
      out.toString
    })

  private val scratchByName =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test-observable: live (registered, on-disk) scratch dirs for `name`. */
  private[graft] def liveScratchDirs(name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    dirs.asScala.collect {
      case ((d, "scratch"), _)
        if d.contains(s"graft-fx-$name-") && java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(d)) => d
    }.toSeq
  }

  /** The cached store directory for `name` built from `dataDir`'s tables;
    * `build` runs at most once per JVM per key, writing into a fresh temp
    * directory. Per-key locking via computeIfAbsent: unrelated fixtures
    * build independently; a failed build deletes its partial temp dir and
    * leaves no cache entry, so the next caller retries cleanly. All cached
    * dirs are removed by a JVM shutdown hook. */
  def dir(dataDir: String, name: String)(build: String => Unit): String =
    dirs.computeIfAbsent((dataDir, name), { _ =>
      val out = java.nio.file.Files.createTempDirectory(s"graft-fx-$name-")
      try { build(out.toString); out.toString }
      catch {
        case e: Throwable =>
          try deleteRecursively(out) catch { case _: Exception => () }
          throw e
      }
    })
}
