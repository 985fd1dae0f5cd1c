package graft.limits

import java.util.concurrent.{Semaphore, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Row}

/** Query quotas + concurrency gate (SURVEY.md §2.6 O5, ref
  * `internal/limits/limit.go:27-94`, semaphore `api/http/query.go:438-442`).
  *
  * Two byte-quota layers, matching the reference's split between planning
  * and materialization:
  *
  *  - `maxBytes` — driver-side PRE-FLIGHT: the optimizer's post-pruning
  *    scan-size estimate, known before any task launches.
  *  - `maxBytesMidScan` — charged DURING the run, the analog of the
  *    reference charging chunk bytes as it materializes
  *    (`internal/limits/limit.go:66-94`): a SparkListener sums each
  *    completed task's `inputMetrics.bytesRead` for this query's job group,
  *    cancels the group once past the ceiling (best-effort early abort —
  *    charge granularity is a completed task, like the reference's
  *    per-materialize-unit charge), and the post-action check makes the
  *    verdict authoritative even when the last task finishes the scan.
  *
  * Row/partition quotas stay pre-flight (`LIMIT max+1` probe / planned scan
  * partitions). The reference's defaults are all "unlimited"
  * (`cmd/serve.go:106-110`); same here — construct with limits to enable.
  */
final class QuotaExceededException(msg: String) extends RuntimeException(msg)

final case class Quotas(maxRows: Option[Long] = None,
                        maxPartitions: Option[Int] = None,
                        maxBytes: Option[Long] = None,
                        maxBytesMidScan: Option[Long] = None) {

  /** Pre-flight guard; returns the DataFrame unchanged when within quota. */
  def guard(df: DataFrame): DataFrame = {
    // byte ceiling (ref CHUNK_BYTES_QUOTA, internal/limits/limit.go:27-64):
    // the optimizer's post-pruning scan-size estimate — partition-pruned
    // file bytes, the same quantity the reference's quota bounds
    maxBytes.foreach { mb =>
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes > BigInt(mb))
        throw new QuotaExceededException(s"scan reads ~$bytes bytes > quota $mb")
    }
    maxPartitions.foreach { mp =>
      val parts = df.rdd.getNumPartitions
      if (parts > mp)
        throw new QuotaExceededException(s"scan touches $parts partitions > quota $mp")
    }
    maxRows.foreach { mr =>
      val probe = df.limit(math.min(mr + 1, Int.MaxValue.toLong).toInt).count()
      if (probe > mr)
        throw new QuotaExceededException(s"select yields > $mr rows")
    }
    df
  }

  /** Pre-flight guard + materialization with the mid-scan byte charge. The
    * driver-side collect boundaries (PromEngine/StoreApi) route through this
    * instead of a bare `.collect()`. */
  def collect(df: DataFrame): Array[Row] = maxBytesMidScan match {
    case None => guard(df).collect()
    case Some(mb) =>
      guard(df)
      val sc = df.sparkSession.sparkContext
      val group = s"graft-byte-quota-${java.util.UUID.randomUUID()}"
      val read = new AtomicLong(0L)
      val tasksSeen = new AtomicLong(0L)
      val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val groupJobs = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val jobsStarted = new AtomicLong(0L)
      val jobsEnded = new AtomicLong(0L)
      val lock = new Object
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          if (group == js.properties.getProperty("spark.jobGroup.id")) {
            groupJobs.add(js.jobId)
            jobsStarted.incrementAndGet()
            js.stageIds.foreach(stages.add(_))
          }
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          if (stages.contains(te.stageId) && te.taskMetrics != null) {
            tasksSeen.incrementAndGet()
            if (read.addAndGet(te.taskMetrics.inputMetrics.bytesRead) > mb)
              sc.cancelJobGroup(group) // early abort: skip remaining tasks
          }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          if (groupJobs.remove(je.jobId))
            lock.synchronized { jobsEnded.incrementAndGet(); lock.notifyAll() }
      }
      /** Await the charge: the listener bus delivers a job's task-end events
        * BEFORE its job-end (single ordered queue), so once every started
        * job has ended the per-task charges for those jobs are in. A
        * job-end latch replaces the old 50 ms sleep-poll — typical overhead
        * is one notify plus the single tail confirmation below (an action's
        * follow-up job, e.g. an AQE stage re-plan, may not have STARTED in
        * the listener's view yet when collect() returns). */
      def settle(): Unit = {
        val deadline = System.nanoTime() + 3000L * 1000000
        lock.synchronized {
          while ((jobsStarted.get() == 0L || jobsEnded.get() < jobsStarted.get()) &&
            System.nanoTime() < deadline)
            lock.wait(math.max(1L, (deadline - System.nanoTime()) / 1000000))
        }
        var last = (-1L, -1L, -1L)
        var i = 0
        while (i < 20 && last != ((read.get(), tasksSeen.get(), jobsStarted.get()))) {
          last = (read.get(), tasksSeen.get(), jobsStarted.get())
          Thread.sleep(10)
          i += 1
        }
      }
      sc.addSparkListener(listener)
      sc.setJobGroup(group, s"byte-quota $mb", interruptOnCancel = true)
      try {
        val rows =
          try df.collect()
          catch { case e: Exception =>
            settle()
            if (read.get() > mb) throw overflow(read.get(), mb) else throw e
          }
        // the authoritative post-check (a scan whose final task completes
        // the job can only be charged after the fact, same as the
        // reference's last materialize call tripping the quota)
        settle()
        if (read.get() > mb) throw overflow(read.get(), mb)
        rows
      } finally {
        sc.clearJobGroup()
        sc.removeSparkListener(listener)
      }
  }

  private def overflow(got: Long, quota: Long) =
    new QuotaExceededException(s"scan read $got bytes > mid-scan quota $quota")
}

/** Concurrent-query semaphore (ref default 100, `cmd/serve.go:111`). */
final class QueryGate(maxConcurrent: Int = 100) {
  private val sem = new Semaphore(maxConcurrent)
  def run[A](timeoutMs: Long = 30000)(body: => A): A = {
    if (!sem.tryAcquire(timeoutMs, TimeUnit.MILLISECONDS))
      throw new QuotaExceededException(s"query queue full ($maxConcurrent concurrent)")
    try body finally sem.release()
  }
  def available: Int = sem.availablePermits()
}
