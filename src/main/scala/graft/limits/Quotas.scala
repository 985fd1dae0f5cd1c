package graft.limits

import java.util.concurrent.{Semaphore, TimeUnit}
import org.apache.spark.sql.DataFrame

/** Query quotas + concurrency gate (SURVEY.md §2.6 O5, ref
  * `internal/limits/limit.go:27-94`, semaphore `api/http/query.go:438-442`).
  *
  * Catalyst has no mid-scan kill hook, so quotas are driver-side pre-flight
  * guards: a `LIMIT max+1` probe (limit pushdown makes it cheap — the scan
  * stops after max+1 rows) plus partition-count checks from the planned scan.
  * The reference's defaults are all "unlimited" (`cmd/serve.go:106-110`); same
  * here — construct with limits to enable.
  */
final class QuotaExceededException(msg: String) extends RuntimeException(msg)

final case class Quotas(maxRows: Option[Long] = None,
                        maxPartitions: Option[Int] = None,
                        maxBytes: Option[Long] = None) {

  /** Pre-flight guard; returns the DataFrame unchanged when within quota. */
  def guard(df: DataFrame): DataFrame = {
    // byte ceiling (ref CHUNK_BYTES_QUOTA, internal/limits/limit.go:27-64):
    // the reference charges chunk bytes as it materializes; Catalyst has no
    // mid-scan hook, so the charge is the optimizer's post-pruning scan-size
    // estimate — partition-pruned file bytes, the same quantity the
    // reference's quota bounds, known before any task launches
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
