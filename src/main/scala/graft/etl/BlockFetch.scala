package graft.etl

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Resumable TSDB-block download with partial-file repair — the local-cache
  * layer the reference puts in front of block opens for flaky object stores
  * (`cmd/convert.go:443-591`). The reference's cache-validity check is
  * length equality: a file whose local size matches meta.json's SizeBytes
  * is skipped, anything else is re-downloaded WHOLE via a truncating
  * `os.Create` (`cmd/convert.go:543-557`). This layer keeps that
  * length-equality check and ADDS tail resume on top: a crashed 500 MB
  * segment download re-fetches only its missing tail — a deliberate
  * extension, not the reference's behavior.
  *
  * Semantics, per file under `<remoteRoot>/<ulid>`:
  *   - local length == remote length → cache hit, the remote file is NOT
  *     opened (zero read bytes);
  *   - local shorter → resume: one positional ranged read of just the
  *     missing `[localLen, remoteLen)` tail, appended;
  *   - local longer (corrupt/partial overwrite) or absent → full fetch,
  *     written to a `.fetch-tmp` sibling and atomically renamed into place
  *     so a torn full fetch can never alias a complete file.
  *
  * Integrity: the readers CRC-check every region they touch — index TOC /
  * symbols / series entries ([[TsdbBlock.readSeries]]), every chunk
  * ([[TsdbBlock.readChunkFrame]]), the tombstones file — so a corrupted
  * resume fails loudly at first read rather than silently serving; length
  * equality is the cheap cache-validity check, exactly the reference's.
  *
  * Driver-side and per-block sequential like the reference's downloader
  * (one block per convert round); the DEFAULT read path
  * ([[graft.sources.TsdbBlockReader]]) still reads blocks in place —
  * this layer is opt-in for unreliable stores, composed via [[cachedDirs]].
  */
object BlockFetch {

  /** Test-observable transfer counters (local-mode specs pin that a repair
    * moves only the missing tail and skips untouched files). */
  private[graft] val bytesFetched = new java.util.concurrent.atomic.AtomicLong()
  private[graft] val filesOpened = new java.util.concurrent.atomic.AtomicLong()

  /** Mirror `<remoteRoot>/<ulid>` into `<localRoot>/<ulid>`, resuming
    * partials; returns the local block directory. Files transfer
    * CONCURRENTLY (`parallelism` streams, like the reference's concurrent
    * block download) — per-file resume logic is independent, so
    * parallelism changes throughput, never bytes moved. */
  def ensureLocal(remoteRoot: String, ulid: String, localRoot: String,
                  conf: Configuration = new Configuration(),
                  parallelism: Int = 4): String = {
    val remoteDir = new Path(s"$remoteRoot/$ulid")
    val fs = remoteDir.getFileSystem(conf)
    // listFiles returns QUALIFIED paths; qualify the base the same way so
    // the prefix strip below is exact
    val qualified = fs.makeQualified(remoteDir).toString
    val files = scala.collection.mutable.ArrayBuffer
      .empty[(org.apache.hadoop.fs.Path, String, Long)]
    val it = fs.listFiles(remoteDir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) {
        val full = st.getPath.toString
        require(full.startsWith(qualified + "/"),
          s"listed file $full outside block dir $qualified")
        files += ((st.getPath, full.stripPrefix(qualified + "/"), st.getLen))
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, files.size)))
    try {
      val futures = files.map { case (path, rel, remoteLen) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = fetchOne(fs, path, remoteLen,
            Paths.get(localRoot, ulid, rel))
        })
      }
      futures.foreach(_.get()) // propagate the first failure
    } finally {
      // On failure no transfer may outlive this call: a retrying caller
      // would otherwise race a still-running background writer on the same
      // local file (one APPEND, one TRUNCATE) — and a torn interleaving that
      // lands at exactly the remote length would pass the length-only cache
      // check forever. shutdownNow interrupts in-flight transfers (Hadoop
      // stream reads surface the interrupt as IOException) and the await
      // bounds teardown before control returns.
      pool.shutdownNow()
      // The await's RESULT matters: returning while a writer thread is still
      // live hands a retrying caller exactly that race. A transfer that
      // ignores interrupt for 60 s is wedged I/O — fail loudly rather than
      // return with a live writer behind the caller's back.
      if (!pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
        throw new java.io.IOException(
          s"block fetch for $remoteRoot/$ulid did not terminate within 60s " +
            "after interrupt; a transfer thread is wedged — refusing to " +
            "return while a background writer may still touch the cache")
    }
    Paths.get(localRoot, ulid).toString
  }

  /** One file's resume-or-fetch (see [[ensureLocal]] semantics). */
  private def fetchOne(fs: FileSystem, path: Path, remoteLen: Long,
                       local: java.nio.file.Path): Unit = {
    Files.createDirectories(local.getParent)
    val localLen = if (Files.isRegularFile(local)) Files.size(local) else -1L
    if (localLen == remoteLen) return
    val resumeAt = if (localLen > 0 && localLen < remoteLen) localLen else 0L
    // A resume must append to the partial in place; a FULL fetch goes to a
    // temp sibling and renames in atomically, so an interrupted/torn full
    // fetch never leaves a file that could pass the length cache check.
    val target =
      if (resumeAt > 0) local
      else local.resolveSibling(local.getFileName.toString + ".fetch-tmp")
    if (resumeAt == 0L) { Files.deleteIfExists(local); Files.deleteIfExists(target) }
    filesOpened.incrementAndGet()
    val in = fs.open(path)
    try {
      if (resumeAt > 0) in.seek(resumeAt)
      val out = Files.newOutputStream(target,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        if (resumeAt > 0) StandardOpenOption.APPEND
        else StandardOpenOption.TRUNCATE_EXISTING)
      try {
        val buf = new Array[Byte](1 << 20)
        var remaining = remoteLen - resumeAt
        while (remaining > 0) {
          val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          require(n > 0, s"remote $path truncated mid-fetch " +
            s"(expected $remaining more bytes)")
          out.write(buf, 0, n)
          bytesFetched.addAndGet(n.toLong)
          remaining -= n
        }
      } finally out.close()
      if (resumeAt == 0L)
        Files.move(target, local,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally in.close()
  }

  /** Fetch every block dir through the local cache, returning the LOCAL
    * dirs — drop-in for the `blockDirs` argument of
    * [[graft.sources.TsdbBlockReader.loadSamples]] when the bucket is
    * flaky enough to want resume-on-retry. */
  def cachedDirs(remoteRoot: String, ulids: Seq[String], localRoot: String,
                 conf: Configuration = new Configuration()): Seq[String] =
    ulids.map(ensureLocal(remoteRoot, _, localRoot, conf))

  /** [[graft.sources.TsdbBlockReader.loader]] with this cache in front —
    * the exact composition the reference's convert loop runs (download/
    * repair, then open): each planned block is mirrored (resuming partials)
    * and the distributed read runs against the local copies. */
  def cachedLoader(spark: org.apache.spark.sql.SparkSession, remoteRoot: String,
                   localRoot: String,
                   matchers: Map[String, Seq[String]] = Map.empty)
      : TsdbStream => org.apache.spark.sql.DataFrame = stream => {
    val conf = spark.sparkContext.hadoopConfiguration
    val dirs = cachedDirs(remoteRoot, stream.metas.map(_.ulid), localRoot, conf)
    graft.sources.TsdbBlockReader.loadSamples(spark, dirs, matchers = matchers)
  }

  /** [[cachedLoader]] with FULL matcher pushdown
    * ([[graft.sources.TsdbBlockReader.loadSamplesMatching]]): a partial
    * migration over a flaky store composes resume-on-retry with
    * regex/negation matchers resolved inside each block's index task. */
  def cachedMatchingLoader(spark: org.apache.spark.sql.SparkSession,
                           remoteRoot: String, localRoot: String,
                           ms: Seq[graft.promql.LabelMatcher])
      : TsdbStream => org.apache.spark.sql.DataFrame = stream => {
    val conf = spark.sparkContext.hadoopConfiguration
    val dirs = cachedDirs(remoteRoot, stream.metas.map(_.ulid), localRoot, conf)
    graft.sources.TsdbBlockReader.loadSamplesMatching(spark, dirs, ms)
  }
}
